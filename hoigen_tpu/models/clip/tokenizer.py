"""CLIP BPE tokenizer (independent implementation of the public algorithm).

Behavior-compatible with OpenAI CLIP's SimpleTokenizer
(/root/reference/CLIP/clip/simple_tokenizer.py) over the same merges file.
The public merges artifact (bpe_simple_vocab_16e6.txt.gz, the standard
OpenAI CLIP release file) ships next to this module; the ``HOIGEN_BPE_VOCAB``
env var or a constructor path can override it. ftfy text fixing is applied
when available (it is a no-op for the ASCII prompts this framework
generates).
"""
import functools
import gzip
import html
import os

import regex as re

_DEFAULT_VOCAB_PATHS = [
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bpe_simple_vocab_16e6.txt.gz"),
]

_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@functools.lru_cache()
def _byte_encoder():
    """Reversible byte -> printable-unicode mapping (GPT-2/CLIP scheme)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _clean(text: str) -> str:
    try:
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


def _find_vocab(path=None):
    candidates = ([path] if path else []) + \
        ([os.environ["HOIGEN_BPE_VOCAB"]] if "HOIGEN_BPE_VOCAB" in os.environ
         else []) + _DEFAULT_VOCAB_PATHS
    for c in candidates:
        if c and os.path.exists(c):
            return c
    raise FileNotFoundError(
        "CLIP BPE merges file not found; set HOIGEN_BPE_VOCAB or place "
        "bpe_simple_vocab_16e6.txt.gz next to tokenizer.py")


class SimpleTokenizer:
    def __init__(self, bpe_path: str = None):
        self.byte_encoder = _byte_encoder()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = gzip.open(_find_vocab(bpe_path), "rt",
                           encoding="utf-8").read().split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        chars = list(self.byte_encoder.values())
        vocab = chars + [c + "</w>" for c in chars]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self._cache = {"<|startoftext|>": "<|startoftext|>",
                       "<|endoftext|>": "<|endoftext|>"}

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str):
        tokens = []
        for piece in re.findall(_PATTERN, _clean(text)):
            piece = "".join(self.byte_encoder[b]
                            for b in piece.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self._bpe(piece).split(" "))
        return tokens

    def decode(self, tokens):
        text = "".join(self.decoder[t] for t in tokens)
        data = bytearray(self.byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def _default_tokenizer():
    return SimpleTokenizer()


def tokenize(texts, context_length: int = 77, truncate: bool = False):
    """Texts -> int32[N, context_length] with SOT/EOT, zero padded
    (semantics of /root/reference/CLIP/clip/clip.py tokenize)."""
    import numpy as np
    if isinstance(texts, str):
        texts = [texts]
    tk = _default_tokenizer()
    sot, eot = tk.encoder["<|startoftext|>"], tk.encoder["<|endoftext|>"]
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [sot] + tk.encode(t) + [eot]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {t!r} too long for context length {context_length}")
            ids = ids[:context_length]
            ids[-1] = eot
        out[i, :len(ids)] = ids
    return out
