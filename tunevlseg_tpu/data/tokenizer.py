"""CLIP byte-pair-encoding tokenizer (self-contained implementation).

Replaces two tokenization paths of the reference:
  * HF `AutoTokenizer.from_pretrained(CIDAS/clipseg-rd64)` used by the
    datasets (src/data/core_datasets/basedataset.py:50-69) — BOS/EOS 49406/
    49407, padding with the EOS token, attention mask;
  * the OpenAI `SimpleTokenizer` vendored for CRIS/DenseCLIP
    (denseclip/untils.py:68) — fixed 77-token context, zero padding.

The BPE algorithm and the standard CLIP vocabulary format
(`bpe_simple_vocab_16e6.txt.gz`) are public; the merges file itself ships
with every CLIP distribution and its path is supplied by config
(`vocab_path`) — no network access required. Since this environment has no
`ftfy`, text cleaning is a close approximation (NFKC + whitespace collapse),
which matches ftfy output for ordinary ASCII/unicode prompts.
"""
from __future__ import annotations

import functools
import gzip
import html
import unicodedata
from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np
import regex as re

_TOKEN_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
    r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)

CONTEXT_LENGTH = 77


@functools.lru_cache()
def _byte_unicode_table() -> dict[int, str]:
    """GPT-2's reversible byte <-> printable-unicode mapping."""
    printable = (list(range(ord("!"), ord("~") + 1))
                 + list(range(ord("¡"), ord("¬") + 1))
                 + list(range(ord("®"), ord("ÿ") + 1)))
    chars = printable[:]
    extra = 0
    for b in range(256):
        if b not in printable:
            printable.append(b)
            chars.append(256 + extra)
            extra += 1
    return dict(zip(printable, (chr(c) for c in chars)))


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = unicodedata.normalize("NFKC", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class CLIPTokenizer:
    """BPE tokenizer over the standard CLIP merges file.

    `vocab_layout="standard"` places the special tokens at the end
    (49406/49407 — OpenAI CLIP / HF CLIPTokenizer; used by CLIPSeg and CRIS).
    `vocab_layout="denseclip"` places them at 512/513 before the merge tokens,
    matching the tokenizer vendored for DenseCLIP in the reference
    (denseclip/untils.py:100-109)."""

    def __init__(self, vocab_path: Union[str, Path], lowercase: bool = True,
                 vocab_layout: str = "standard"):
        raw = Path(vocab_path).read_bytes()
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        lines = raw.decode("utf-8").split("\n")
        # line 0 is a version header; CLIP uses the first 48894 merge rules
        merge_lines = lines[1:49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines if line]

        byte_table = _byte_unicode_table()
        self._byte_encoder = byte_table
        vocab = list(byte_table.values())
        vocab.extend(v + "</w>" for v in list(byte_table.values()))
        if vocab_layout == "denseclip":
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            vocab.extend("".join(m) for m in merges)
        elif vocab_layout == "standard":
            vocab.extend("".join(m) for m in merges)
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        else:
            raise ValueError(f"unknown vocab_layout {vocab_layout}")

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self._merge_ranks = {m: i for i, m in enumerate(merges)}
        self._cache: dict[str, tuple[str, ...]] = {}
        self.lowercase = lowercase

        self.bos_token_id = self.encoder["<|startoftext|>"]
        self.eos_token_id = self.encoder["<|endoftext|>"]
        self.vocab_size = len(vocab)

    # -- BPE core -----------------------------------------------------------

    def _bpe(self, token: str) -> tuple[str, ...]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(parts) > 1:
            pairs = {(parts[i], parts[i + 1]) for i in range(len(parts) - 1)}
            best = min(pairs, key=lambda p: self._merge_ranks.get(p, 1 << 30))
            if best not in self._merge_ranks:
                break
            merged = []
            i = 0
            while i < len(parts):
                if (i < len(parts) - 1
                        and (parts[i], parts[i + 1]) == best):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = tuple(merged)
        self._cache[token] = parts
        return parts

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        text = _clean_text(text)
        if self.lowercase:
            text = text.lower()
        ids: list[int] = []
        for word in _TOKEN_PATTERN.findall(text):
            as_unicode = "".join(self._byte_encoder[b]
                                 for b in word.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(as_unicode))
        if add_special_tokens:
            return [self.bos_token_id, *ids, self.eos_token_id]
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids
                       if i not in (self.bos_token_id, self.eos_token_id))
        table = {v: k for k, v in self._byte_encoder.items()}
        raw = bytes(table[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    # -- batch APIs ---------------------------------------------------------

    def __call__(
        self,
        texts: Union[str, Sequence[str]],
        max_length: int = CONTEXT_LENGTH,
        padding: str = "max_length",
        style: str = "hf",
    ) -> dict[str, np.ndarray]:
        """Tokenize to fixed-shape int32 arrays.

        style="hf": pad with the EOS id + attention mask (HF CLIPTokenizer —
        the CLIPSeg path). style="openai": pad with 0, no mask needed by the
        caller (the CRIS path derives its pad mask from `ids == 0`).
        Truncation keeps the EOS in the final slot (HF truncates then appends
        EOS; OpenAI overwrites the last slot with EOS).
        """
        if isinstance(texts, str):
            texts = [texts]
        pad_id = self.eos_token_id if style == "hf" else 0
        n = len(texts)
        if padding == "max_length":
            width = max_length
        else:  # "longest" — still deterministic per batch
            width = min(max_length,
                        max(len(self.encode(t)) for t in texts))
        input_ids = np.full((n, width), pad_id, np.int32)
        attention_mask = np.zeros((n, width), np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            if len(ids) > width:
                ids = ids[:width]
                ids[-1] = self.eos_token_id
            input_ids[i, :len(ids)] = ids
            attention_mask[i, :len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}


class WordPieceTokenizer:
    """BERT WordPiece tokenizer (the BiomedCLIP text side).

    Replaces `AutoTokenizer.from_pretrained(microsoft/BiomedNLP-BiomedBERT-
    base-uncased-abstract)` from the reference's zsseg_biomedclip experiment
    (configs/experiment/zsseg_biomedclip.yaml:63): basic tokenization
    (lowercase, accent-strip, punctuation split) + greedy longest-match
    WordPiece over a standard `vocab.txt`. Emits [CLS] ... [SEP] with 0
    ([PAD]) padding and an attention mask — the contract
    `BiomedCLIP.get_text_features` expects (pad_token_id 0)."""

    def __init__(self, vocab_path: Union[str, Path], lowercase: bool = True,
                 max_input_chars_per_word: int = 100):
        lines = Path(vocab_path).read_text(encoding="utf-8").split("\n")
        self.encoder = {tok: i for i, tok in enumerate(lines) if tok}
        self.decoder = {i: t for t, i in self.encoder.items()}
        self.lowercase = lowercase
        self.max_word_chars = max_input_chars_per_word
        self.pad_token_id = self.encoder.get("[PAD]", 0)
        self.cls_token_id = self.encoder["[CLS]"]
        self.sep_token_id = self.encoder["[SEP]"]
        self.unk_token_id = self.encoder["[UNK]"]
        self.vocab_size = len(self.encoder)

    @staticmethod
    def _is_punct(ch: str) -> bool:
        cp = ord(ch)
        if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
                or 123 <= cp <= 126):
            return True
        return unicodedata.category(ch).startswith("P")

    def _basic_tokenize(self, text: str) -> list[str]:
        text = _clean_text(text)
        if self.lowercase:
            text = text.lower()
            # strip accents (BERT uncased behavior)
            text = "".join(c for c in unicodedata.normalize("NFD", text)
                           if unicodedata.category(c) != "Mn")
        words: list[str] = []
        for tok in text.split():
            buf = ""
            for ch in tok:
                if self._is_punct(ch):
                    if buf:
                        words.append(buf)
                        buf = ""
                    words.append(ch)
                else:
                    buf += ch
            if buf:
                words.append(buf)
        return words

    def _wordpiece(self, word: str) -> list[int]:
        if len(word) > self.max_word_chars:
            return [self.unk_token_id]
        ids: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.encoder:
                    cur = self.encoder[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_token_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids = [i for w in self._basic_tokenize(text)
               for i in self._wordpiece(w)]
        if add_special_tokens:
            return [self.cls_token_id, *ids, self.sep_token_id]
        return ids

    def __call__(
        self,
        texts: Union[str, Sequence[str]],
        max_length: int = 256,
        padding: str = "max_length",
        style: str = "bert",
    ) -> dict[str, np.ndarray]:
        """Same batch contract as CLIPTokenizer.__call__; `style` is accepted
        for interchangeability and ignored (BERT always pads with [PAD] and
        keeps [SEP] in the final slot on truncation)."""
        if isinstance(texts, str):
            texts = [texts]
        n = len(texts)
        if padding == "max_length":
            width = max_length
        else:
            width = min(max_length,
                        max(len(self.encode(t)) for t in texts))
        input_ids = np.full((n, width), self.pad_token_id, np.int32)
        attention_mask = np.zeros((n, width), np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            if len(ids) > width:
                ids = ids[:width]
                ids[-1] = self.sep_token_id
            input_ids[i, :len(ids)] = ids
            attention_mask[i, :len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}


DEFAULT_VOCAB_CANDIDATES = (
    Path(__file__).resolve().parents[2] / "assets" / "bpe_simple_vocab_16e6.txt.gz",
    Path("/root/reference/src/models/components/denseclip/bpe_simple_vocab_16e6.txt.gz"),
)


def load_default_tokenizer(vocab_path: Optional[Union[str, Path]] = None
                           ) -> CLIPTokenizer:
    if vocab_path is not None:
        return CLIPTokenizer(vocab_path)
    for cand in DEFAULT_VOCAB_CANDIDATES:
        if Path(cand).exists():
            return CLIPTokenizer(cand)
    raise FileNotFoundError(
        "No CLIP BPE vocab found. Provide `vocab_path` pointing at "
        "bpe_simple_vocab_16e6.txt.gz (ships with every CLIP distribution).")
