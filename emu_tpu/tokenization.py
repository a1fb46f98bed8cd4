"""Tokenizer wiring: LLaMA tokenizer + Emu multimodal special tokens.

Reproduces the reference's special-token registration order exactly —
checkpoint embedding rows are keyed to these ids:

- Emu1 (ref Emu1/models/modeling_llama.py:127-186): [PAD]=32000,
  [IMG]=32001, [/IMG]=32002, <image>=32003 (+[USER]=32004,
  [ASSISTANT]=32005 for Emu-I).
- Emu2 (ref Emu2/emu/lm.py:12-65, constants.py): [PAD]=32000 then
  [IMG] [/IMG] <image> [gIMG] [/gIMG] [EOC] [VIDEO] <grounding> <phrase>
  </phrase> <object> </object> </delimiter_of_multi_objects/> <REC> and
  257 <patch_index_NNNN> grounding-coordinate tokens (+[USER]/[ASSISTANT]
  for -Chat) → vocab 32272 (base) / 32274 (chat).

Two backends: the real HF fast tokenizer (from a LLaMA tokenizer.json dir)
and `SimpleTokenizer`, a deterministic hash-bucket fallback so pipelines,
tests and demos run without the original tokenizer assets.
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

# --- special-token string tables (ref Emu2/emu/constants.py:12-43) ---------

PAD = "[PAD]"
BOS = "<s>"
EOS = "</s>"
UNK = "<unk>"
IMG = "[IMG]"
IMG_END = "[/IMG]"
IMAGE = "<image>"
GIMG = "[gIMG]"
GIMG_END = "[/gIMG]"
EOC = "[EOC]"
VIDEO = "[VIDEO]"
GRD = "<grounding>"
BOP = "<phrase>"
EOP = "</phrase>"
BOO = "<object>"
EOO = "</object>"
DOM = "</delimiter_of_multi_objects/>"
REC = "<REC>"
USER = "[USER]"
ASSISTANT = "[ASSISTANT]"

IMG_PLACEHOLDER = "[<IMG_PLH>]"
VID_PLACEHOLDER = "[<VID_PLH>]"
FAKE_VIDEO_END = "[/VIDEO]"

SYSTEM_MESSAGE = ("You are a helpful assistant, dedicated to delivering "
                  "comprehensive and meticulous responses.")
GROUND_SYSTEM_MESSAGE = ("You are a helpful assistant, dedicated to provide "
                         "concise and efficient answers.")


def location_symbols(quantized_size: int = 256) -> List[str]:
    """Grounding coordinate tokens (ref Emu2/emu/lm.py:12-27)."""
    toks = [GRD, BOP, EOP, BOO, EOO, DOM, REC]
    toks += [f"<patch_index_{str(i).zfill(4)}>"
             for i in range(quantized_size + 1)]
    return toks


def emu1_special_tokens(instruct: bool = False) -> List[str]:
    toks = [IMG, IMG_END, IMAGE]
    if instruct:
        toks += [USER, ASSISTANT]
    return toks


def emu2_special_tokens(instruct: bool = False) -> List[str]:
    toks = [IMG, IMG_END, IMAGE, GIMG, GIMG_END, EOC, VIDEO]
    toks += location_symbols()
    if instruct:
        toks += [USER, ASSISTANT]
    return toks


class EmuTokenizer:
    """Unified tokenizer facade over an HF backend or SimpleTokenizer.

    Special ids are assigned [PAD]=base_vocab, then the additional tokens in
    registration order — matching the reference's resized embeddings.
    """

    def __init__(self, backend, specials: Sequence[str],
                 base_vocab: int = 32000, bos_id: int = 1, eos_id: int = 2):
        self.backend = backend
        self.base_vocab = base_vocab
        self.bos_token_id = bos_id
        self.eos_token_id = eos_id
        self.pad_token_id = base_vocab
        self._special_ids = {PAD: base_vocab}
        for i, tok in enumerate(specials):
            self._special_ids[tok] = base_vocab + 1 + i
        self.vocab_size = base_vocab + 1 + len(specials)
        # longest-first alternation so [/IMG] wins over [IMG] etc.
        pats = sorted(self._special_ids, key=len, reverse=True)
        self._split_re = re.compile(
            "(" + "|".join(re.escape(p) for p in pats) + ")")

    @classmethod
    def emu1(cls, tokenizer_path: Optional[str] = None,
             instruct: bool = False) -> "EmuTokenizer":
        return cls(_make_backend(tokenizer_path),
                   emu1_special_tokens(instruct))

    @classmethod
    def emu2(cls, tokenizer_path: Optional[str] = None,
             instruct: bool = False) -> "EmuTokenizer":
        return cls(_make_backend(tokenizer_path),
                   emu2_special_tokens(instruct))

    def token_to_id(self, tok: str) -> int:
        if tok in self._special_ids:
            return self._special_ids[tok]
        return self.backend.token_to_id(tok)

    @property
    def image_token_id(self) -> int:
        return self._special_ids[IMAGE]

    @property
    def img_token_id(self) -> int:
        return self._special_ids[IMG]

    @property
    def img_end_token_id(self) -> int:
        return self._special_ids[IMG_END]

    @property
    def gimg_token_id(self) -> int:
        return self._special_ids.get(GIMG, -1)

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        """Tokenize, routing special-token substrings to their fixed ids."""
        ids: List[int] = [self.bos_token_id] if add_bos else []
        for part in self._split_re.split(text):
            if not part:
                continue
            if part in self._special_ids:
                ids.append(self._special_ids[part])
            else:
                ids.extend(self.backend.encode(part))
        return ids

    def encode_batch(self, texts: Sequence[str], padding_side: str = "left",
                     add_bos: bool = True,
                     pad_to_multiple: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (ids [B, S], attention_mask [B, S]); "longest" padding.

        pad_to_multiple buckets the sequence length so jitted consumers
        reuse compiled programs across nearby prompt lengths."""
        seqs = [self.encode(t, add_bos) for t in texts]
        max_len = max(len(s) for s in seqs)
        if pad_to_multiple:
            max_len = ((max_len + pad_to_multiple - 1)
                       // pad_to_multiple * pad_to_multiple)
        ids = np.full((len(seqs), max_len), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), max_len), np.int32)
        for i, s in enumerate(seqs):
            if padding_side == "left":
                ids[i, max_len - len(s):] = s
                mask[i, max_len - len(s):] = 1
            else:
                ids[i, :len(s)] = s
                mask[i, :len(s)] = 1
        return ids, mask

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True
               ) -> str:
        inv = {v: k for k, v in self._special_ids.items()}
        inv[self.bos_token_id] = BOS
        inv[self.eos_token_id] = EOS
        out, chunk = [], []
        for i in ids:
            i = int(i)
            # base-vocab ids (including <unk>=0) flow to the backend;
            # only added specials and bos/eos break the chunk
            if i >= self.base_vocab or i in (self.bos_token_id,
                                             self.eos_token_id):
                if chunk:
                    out.append(self.backend.decode(chunk))
                    chunk = []
                if not skip_special_tokens:
                    out.append(inv.get(i, ""))
            else:
                chunk.append(i)
        if chunk:
            out.append(self.backend.decode(chunk))
        return "".join(out)

    def batch_decode(self, batch, skip_special_tokens: bool = True
                     ) -> List[str]:
        return [self.decode(row, skip_special_tokens) for row in batch]


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------


class SimpleTokenizer:
    """Deterministic hash-bucket word tokenizer (test/demo fallback).

    Hashes whitespace/punct-split pieces into [3, base_vocab); decode is
    lossy by construction but deterministic and readable (`⟨id⟩` markers).
    """

    def __init__(self, base_vocab: int = 32000):
        self.base_vocab = base_vocab
        self._memo = {}

    def encode(self, text: str) -> List[int]:
        ids = []
        for piece in re.findall(r"\S+|\s+", text):
            if piece.isspace():
                continue
            h = int(hashlib.md5(piece.encode()).hexdigest(), 16)
            tid = 3 + (h % (self.base_vocab - 3))
            self._memo[tid] = piece
            ids.append(tid)
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(self._memo.get(int(i), f"⟨{int(i)}⟩") for i in ids)

    def token_to_id(self, tok: str) -> int:
        return self.encode(tok)[0]


class HFBackend:
    """transformers fast-tokenizer backend (LLaMA tokenizer.json)."""

    def __init__(self, path: str):
        from transformers import LlamaTokenizerFast
        self.tok = LlamaTokenizerFast.from_pretrained(path, legacy=False)

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(list(ids))

    def token_to_id(self, tok: str) -> int:
        return self.tok.convert_tokens_to_ids(tok)


def _make_backend(tokenizer_path: Optional[str]):
    if tokenizer_path is None:
        return SimpleTokenizer()
    return HFBackend(tokenizer_path)
