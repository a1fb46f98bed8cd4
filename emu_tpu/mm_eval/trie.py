"""Token trie → dense transition tables for constrained decoding.

Equivalent of the reference's Trie + `prefix_allowed_tokens_fn` used for
VizWiz answerability (ref Emu1/mm_eval/models/trie.py:16,
mm_eval/models/emu.py:97-109), recast as fixed-shape arrays the jitted
decode loop can index: `allowed[state]` is the token mask, `next[state,
token]` the transition. Terminal/sink states allow only EOS/pad.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def build_trie(sequences: Sequence[Sequence[int]], vocab_size: int,
               eos_token_id: int, pad_token_id: int) -> Dict[str, np.ndarray]:
    """Build {"allowed": [S, V] bool, "next": [S, V] int32} from candidate
    token sequences (each should end with eos_token_id)."""
    children: List[Dict[int, int]] = [{}]
    for seq in sequences:
        node = 0
        for tok in seq:
            nxt = children[node].get(int(tok))
            if nxt is None:
                children.append({})
                nxt = len(children) - 1
                children[node][int(tok)] = nxt
            node = nxt

    n = len(children) + 1
    sink = n - 1
    allowed = np.zeros((n, vocab_size), bool)
    nxt = np.full((n, vocab_size), sink, np.int32)
    for state, kids in enumerate(children):
        if kids:
            for tok, child in kids.items():
                allowed[state, tok] = True
                nxt[state, tok] = child
        else:                                  # leaf → only eos/pad
            allowed[state, eos_token_id] = True
            allowed[state, pad_token_id] = True
    allowed[sink, eos_token_id] = True
    allowed[sink, pad_token_id] = True
    return {"allowed": allowed, "next": nxt}
