"""Text tokenization (CLIP-compatible interface).

The reference tokenizes ScanRefer descriptions with ``clip.tokenize``
(dataset/data.py:13,195) — a byte-pair-encoding tokenizer with SOT/EOT
wrappers, padding/truncation to a fixed context length — and also vendors a
standalone BPE (dataset/dataset_utils/tokenizer.py).  This module provides:

- :class:`BpeTokenizer`: a from-scratch BPE implementation loading a CLIP
  merges vocabulary from a local path (``bpe_simple_vocab_16e6.txt.gz``
  format: one merge pair per line).  A locally-trained ScanNet-vocabulary
  asset ships at ``assets/bpe_scannet.txt.gz`` (tdwss.data.bpe_train); the
  real CLIP file drops in via ``text_data.bpe_vocab_path`` for exact
  clip.tokenize ids (zero-egress images cannot vendor it).
- :class:`HashTokenizer`: a deterministic fallback (word -> stable hash mod
  vocab) with the same SOT/EOT/padding conventions — sufficient for training
  the from-scratch ``TextTransformer``, where only *consistency* matters.
- :func:`tokenize`: clip.tokenize-compatible entry point.
"""

from __future__ import annotations

import gzip
import hashlib
import html
import re
from functools import lru_cache
from typing import List, Optional, Sequence

import numpy as np

SOT_TOKEN = 49406
EOT_TOKEN = 49407
VOCAB_SIZE = 49408

try:
    # CLIP's exact pattern needs \p{L}/\p{N} (the regex module); "café"
    # must be ONE word, not "caf"+"é" — the ASCII fallback below diverges
    # from clip.tokenize on non-ASCII words only.
    import regex as _regex

    _WORD_RE = _regex.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _regex.IGNORECASE)
except ImportError:                                    # pragma: no cover
    _WORD_RE = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
        re.IGNORECASE)


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


@lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class HashTokenizer:
    """Deterministic word-hash tokenizer with CLIP conventions.

    Token ids land in [1, 49406) so SOT/EOT/PAD(0) stay reserved.  Stable
    across processes (md5, not python hash()).
    """

    vocab_size = VOCAB_SIZE

    def encode(self, text: str) -> List[int]:
        words = _WORD_RE.findall(_basic_clean(text))
        out = []
        for w in words:
            h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:8], 16)
            out.append(1 + h % (SOT_TOKEN - 1))
        return out


class BpeTokenizer:
    """Byte-pair-encoding tokenizer over a CLIP-format merges file.

    Works with the real CLIP ``bpe_simple_vocab_16e6.txt.gz`` (vocab 49408)
    AND with smaller locally-trained merges files (tdwss.data.bpe_train —
    no egress ships the CLIP asset); ``vocab_size``/``sot_id``/``eot_id``
    derive from the loaded vocabulary.
    """

    def __init__(self, merges_path: str):
        opener = gzip.open if merges_path.endswith(".gz") else open
        with opener(merges_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1: 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.decoder = {i: v for v, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.vocab_size = len(vocab)
        self.sot_id = self.encoder["<|startoftext|>"]
        self.eot_id = self.encoder["<|endoftext|>"]
        self._cache = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self._cache[token] = list(word)
        return list(word)

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        for tok in _WORD_RE.findall(_basic_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            out.extend(self.encoder[t] for t in self._bpe(tok) if t in self.encoder)
        return out

    def decode(self, ids: Sequence[int]) -> str:
        """Inverse of encode on clean text (CLIP decode semantics)."""
        text = "".join(self.decoder.get(int(i), "") for i in ids
                       if int(i) not in (self.sot_id, self.eot_id))
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace(
            "</w>", " ").strip()


_DEFAULT_TOKENIZER: Optional[object] = None
_BPE_CACHE: dict = {}

# Shipped vocabulary trained on ScanNet-vocabulary text by
# tdwss.data.bpe_train (regenerate: python -m tdwss.data.bpe_train).  Drop
# the real CLIP ``bpe_simple_vocab_16e6.txt.gz`` at a config path
# (text_data.bpe_vocab_path) for exact clip.tokenize ids.
DEFAULT_VOCAB_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "assets", "bpe_scannet.txt.gz")


def get_tokenizer(merges_path: Optional[str] = None):
    """BPE over (in order) the provided path, the shipped asset, else the
    HashTokenizer fallback.  BPE instances are cached per path."""
    global _DEFAULT_TOKENIZER
    import os

    path = merges_path or (
        DEFAULT_VOCAB_PATH if os.path.exists(DEFAULT_VOCAB_PATH) else None)
    if path:
        if path not in _BPE_CACHE:
            _BPE_CACHE[path] = BpeTokenizer(path)
        return _BPE_CACHE[path]
    if _DEFAULT_TOKENIZER is None:
        _DEFAULT_TOKENIZER = HashTokenizer()
    return _DEFAULT_TOKENIZER


def tokenize(texts: Sequence[str], context_length: int = 77,
             tokenizer=None, vocab_size: int = VOCAB_SIZE) -> np.ndarray:
    """clip.tokenize parity: (B, context_length) int32, SOT ... EOT, 0-pad.

    ``vocab_size`` adapts ids to a smaller embedding table (test/tiny
    configs): SOT/EOT become vocab-2 / vocab-1 (EOT must stay the largest id
    — the transformer pools at argmax(token)), word ids fold into
    [1, vocab-3].
    """
    if isinstance(texts, str):
        texts = [texts]
    tokenizer = tokenizer or get_tokenizer()
    tok_vocab = getattr(tokenizer, "vocab_size", VOCAB_SIZE)
    sot = getattr(tokenizer, "sot_id", SOT_TOKEN)
    eot = getattr(tokenizer, "eot_id", EOT_TOKEN)
    fold = vocab_size < tok_vocab    # embedding table smaller than vocab
    if fold:
        if vocab_size < 8:
            raise ValueError(f"vocab_size too small: {vocab_size}")
        sot, eot = vocab_size - 2, vocab_size - 1
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        ids = tokenizer.encode(text)[: context_length - 2]
        if fold:
            ids = [1 + (t % (vocab_size - 3)) for t in ids]
        ids = [sot] + ids + [eot]
        out[i, : len(ids)] = ids
    return out
