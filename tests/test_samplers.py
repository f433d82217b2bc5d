"""Samplers vs the reference semantics
(/root/reference/pocket/pocket/data/samplers.py) — deterministic cases
replicate the reference docstring examples verbatim; randomized ones
check the documented invariants (composition, rotation, renewal)."""
import numpy as np
import pytest

from hoigen_tpu.data.samplers import (GroupedBatchSampler,
                                      IndexSequentialSampler,
                                      OnlineBatchSampler,
                                      ParallelOnlineBatchSampler,
                                      StratifiedBatchSampler,
                                      create_aspect_ratio_groups)


def test_online_batch_sampler_anchor_mixing():
    s = OnlineBatchSampler(np.arange(10), batch_size=4, num_anchors=2)
    b1 = s.next()
    assert b1.tolist() == [0, 1, 2, 3]
    # carry the top-2 of the previous batch as anchors
    s.anchors = b1[:2]
    b2 = s.next()
    assert b2.tolist() == [0, 1, 4, 5]
    with pytest.raises(ValueError):
        s.anchors = np.array([1, 2, 3])          # wrong shape
    s.anchors = b2[-2:]
    assert s.next().tolist() == [4, 5, 6, 7]
    assert s.next().tolist() == [4, 5, 8, 9]     # anchors persist
    with pytest.raises(StopIteration):
        s.next()


def test_parallel_online_batch_sampler_reference_example():
    # the exact example from the reference docstring (:101-125)
    a = [np.array([1, 2, 3, 4, 5, 6, 7]),
         np.array([8, 9, 10, 11, 12, 13]),
         np.array([14, 15, 16, 17, 18])]
    sampler = ParallelOnlineBatchSampler(a, 4, 1)
    batches = []
    while True:
        try:
            b, ptr = sampler.next()
        except StopIteration:
            break
        batches.append(b.tolist())
        sampler.set_anchors(b[-1, None], ptr)
    assert batches == [[1, 2, 3, 4], [8, 9, 10, 11], [14, 15, 16, 17],
                       [4, 5, 6, 7], [11, 12, 13], [17, 18]]


def test_index_sequential_sampler():
    assert list(IndexSequentialSampler([1, 2, 3, 4])) == [1, 2, 3, 4]
    assert list(IndexSequentialSampler(np.array([5, 6]))) == [5, 6]
    assert len(IndexSequentialSampler(np.arange(7))) == 7


def test_stratified_batch_sampler_invariants():
    # 2 strata x 2 samples + 3 negatives, as in the reference example
    strata = [np.array([0, 1, 2]), np.array([3, 4, 5])]
    negatives = np.array([6, 7, 8, 9])
    s = StratifiedBatchSampler(strata, 1, 2, 5, negatives, 3, seed=0)
    batches = list(s)
    assert len(batches) == len(s) == 5
    for i, batch in enumerate(batches):
        assert len(batch) == 2 + 3
        stratum = strata[i % 2]                 # strata visited round-robin
        assert set(batch[:2]) <= set(stratum.tolist())
        assert set(batch[2:]) <= set(negatives.tolist())
    # renewal draws without replacement: the first full pass over a
    # stratum's stream contains no repeats
    stream0 = [x for i, b in enumerate(batches) if i % 2 == 0
               for x in b[:2]]
    assert sorted(stream0[:3]) == [0, 1, 2]


def test_grouped_batch_sampler():
    group_ids = [0, 1, 0, 1, 0, 1, 0]
    s = GroupedBatchSampler(IndexSequentialSampler(np.arange(7)),
                            group_ids, batch_size=2)
    batches = list(s)
    assert len(batches) == len(s) == 3
    for batch in batches:
        assert len(batch) == 2
        assert len({group_ids[i] for i in batch}) == 1   # group-pure
    # base order preserved within groups
    assert batches[0] == [0, 2]
    assert batches[1] == [1, 3]


def test_grouped_batch_sampler_pads_deterministically():
    # 5 samples in 3 groups, batch 2 -> 2 batches; the trailing partial
    # group tops up by repeating its own seen samples
    group_ids = [0, 0, 1, 2, 1]
    s = GroupedBatchSampler(IndexSequentialSampler(np.arange(5)),
                            group_ids, batch_size=2)
    batches = list(s)
    assert len(batches) == 2
    assert batches[0] == [0, 1]
    assert len(batches[1]) == 2
    assert len({group_ids[i] for i in batches[1]}) == 1


def test_create_aspect_ratio_groups():
    ratios = [0.4, 0.9, 1.0, 1.6, 2.5]
    assert create_aspect_ratio_groups(ratios, k=0) == [0, 0, 1, 1, 1]
    # k=1 -> bins [0.5, 1.0, 2.0] -> up to 2k+2 groups
    groups = create_aspect_ratio_groups(ratios, k=1)
    assert groups == [0, 1, 2, 2, 3]
    assert groups == sorted(groups)              # monotone in ratio
