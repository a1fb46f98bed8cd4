"""Continuous batching: decode-step-level request scheduling.

The reference serves requests one `model.generate` call at a time
(Emu1/inference.py, Emu2 gradio demos), and this repo's
serving.batching coalesces whole requests with equal shapes. This
module goes to the decode-step granularity (vLLM/JetStream-style): a
fixed pool of batch slots advances ONE jitted decode step per token
across whatever mix of requests currently occupies the slots; new
requests prefill into free slots between steps and finished ones leave
immediately, so short requests never wait for long ones.

TPU-native design: all per-slot state (KV cache, write indices, rope
positions, last tokens, active flags, output buffer) lives on device in
fixed-shape arrays — admission and retirement are `.at[slot].set`
updates inside jitted programs, never re-compilations. Prefill jits per
prompt-length bucket; the decode step compiles exactly once.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emu_tpu.models import llama


@dataclass
class _Request:
    req_id: int
    prompt_len: int
    max_new: int
    tokens: List[int] = field(default_factory=list)
    done: bool = False


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket "
                     f"{buckets[-1]}")


class ContinuousEngine:
    """Slot-pool greedy/sampling decode engine over the LLaMA decoder.

    submit() admits a request into a free slot (prefill); step() advances
    every active slot one token; finished() drains completed requests.
    """

    def __init__(self, params, cfg, *, max_slots: int = 8,
                 max_len: int = 512, prefill_buckets=(32, 64, 128, 256),
                 eos_token_id: Optional[int] = 2, temperature: float = 0.0,
                 cache_dtype=None, kv_cache_quant: bool = False,
                 chunk_size: Optional[int] = None, seed: int = 0,
                 per_request_sampling: bool = False,
                 max_prefill_rows: Optional[int] = None):
        self.params, self.cfg = params, cfg
        # 8-multiple capacity keeps the Pallas decode kernel eligible
        max_len = -(-max_len // 8) * 8
        self.max_slots, self.max_len = max_slots, max_len
        self.buckets = tuple(sorted(b for b in prefill_buckets
                                    if b <= max_len))
        self.eos = -1 if eos_token_id is None else int(eos_token_id)
        self.temperature = float(temperature)
        # per_request_sampling: submit(..., temperature=t) overrides the
        # pool default per slot (a per-row temperature plane in state;
        # greedy rows take jnp.where's argmax arm). Static at engine
        # construction so pure-greedy pools keep the smaller step
        # program (no gumbel chain on the launch-bound decode path).
        self.sampling = per_request_sampling or self.temperature > 0
        self.per_request_sampling = per_request_sampling
        # chunked (Sarathi-style) admission: prompts longer than the
        # largest prefill bucket stream into their slot chunk_size tokens
        # per MIXED step, interleaved with every other slot's decode —
        # no slot ever stalls behind a long prefill, and prompt length is
        # bounded by max_len instead of the largest bucket. Keep <= 32
        # so mixed steps stay on the Pallas decode kernel.
        self.chunk_size = chunk_size
        # HBM guard for batched admission: the prefill program's
        # transient small cache is p * s_bucket tokens (~0.41 MB/token
        # at 13B int8-KV) ON TOP of weights + the big cache; pools sized
        # to the HBM edge cap p so admission bursts split into several
        # programs instead of overshooting (measured: 16 slots x 128
        # prompt at 13B int8 OOMs a 16 GB chip exactly here)
        self.max_prefill_rows = max_prefill_rows
        self._admissions: List[dict] = []
        self._rng = jax.random.PRNGKey(seed)
        self._ids = itertools.count()
        self.requests: Dict[int, _Request] = {}
        self.slot_req: List[Optional[int]] = [None] * max_slots
        # per-slot admission generation: step_block snapshots these at
        # dispatch so record_block can tell whether a block's rows
        # belong to the slot's CURRENT request (double buffering records
        # block i after dispatching block i+1 — a slot retired and
        # readmitted in between must not have the stale block's
        # active/still flags applied to the new request)
        self._slot_gen: List[int] = [0] * max_slots
        # per-slot tokens DISPATCHED since admission (host-side mirror;
        # counts steps sent to the device, not steps recorded) — feeds
        # suggested_block's budget-aware sizing
        self._dispatched: List[int] = [0] * max_slots
        if cache_dtype is None:
            cache_dtype = params["norm"].dtype
        self.state = {
            "cache": llama.init_cache(cfg, max_slots, max_len,
                                      dtype=cache_dtype,
                                      quant=kv_cache_quant),
            "slot_mask": jnp.zeros((max_slots, max_len), bool),
            "write_idx": jnp.zeros((max_slots,), jnp.int32),
            "position": jnp.zeros((max_slots,), jnp.int32),
            "last_token": jnp.zeros((max_slots,), jnp.int32),
            "active": jnp.zeros((max_slots,), bool),
            "n_generated": jnp.zeros((max_slots,), jnp.int32),
            "max_new": jnp.zeros((max_slots,), jnp.int32),
            "temperature": jnp.full((max_slots,), self.temperature,
                                    jnp.float32),
        }
        # PER-INSTANCE jit wrappers: a class-level @jax.jit with self as
        # a static argnum keys the GLOBAL jit cache on the engine
        # instance — every engine ever constructed (serving restarts,
        # bench warmups) stays strongly referenced by that cache along
        # with its final donated state (the multi-GB KV planes). Binding
        # the jits here scopes each engine's executables and retained
        # buffers to the engine's own lifetime: drop the engine, free
        # the HBM (the r5 serving-lane RESOURCE_EXHAUSTED).
        self._step_jit = jax.jit(self._step_impl, donate_argnums=(1,))
        self._block_jit = jax.jit(self._block_impl, static_argnums=(1,),
                                  donate_argnums=(2,))
        self._mixed_jit = jax.jit(self._mixed_impl, donate_argnums=(1,))
        self._prefill_jit = jax.jit(self._prefill_impl,
                                    static_argnums=(4,),
                                    donate_argnums=(1,))
        # pack a block's (toks, actives, still) into ONE int32 array so
        # record costs a single host fetch: each np.asarray is a full
        # RPC round-trip on the tunneled backend (~25 ms+ of latency,
        # independent of size) and three per block dominated the
        # measured serving wall at 32 slots
        self._pack_jit = jax.jit(lambda t, a, s: jnp.concatenate(
            [t, a.astype(jnp.int32), s[None].astype(jnp.int32)], 0))

    # -- jitted programs ----------------------------------------------------

    # Every program that takes `state` DONATES it: the multi-GB KV cache
    # crosses the jit boundary each step/block, and without donation the
    # input and output cache buffers are simultaneously live — +2x cache
    # HBM next to full-depth weights (the r5 serving-lane OOM). The
    # engine always replaces self.state with the result, so the donated
    # buffers are never re-read.
    def _sample(self, logits, temps, rng):
        """Per-row next token: sampled where temps > 0, greedy otherwise
        (temps is a row vector or a scalar)."""
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if not self.sampling:
            return greedy
        t = jnp.maximum(jnp.asarray(temps, jnp.float32), 1e-6)
        if logits.ndim == 1:
            sampled = jax.random.categorical(rng, logits / t)
        else:
            sampled = jax.random.categorical(
                rng, logits / t[..., None], axis=-1)
        return jnp.where(jnp.asarray(temps) > 0,
                         sampled.astype(jnp.int32), greedy)

    def _step_body(self, params, state, rng):
        cfg = self.cfg
        st = dict(state)
        active = st["active"]
        slots = st["write_idx"]
        bidx = jnp.arange(self.max_slots)
        # the new token's own slot becomes attendable (active rows only)
        slot_mask = st["slot_mask"].at[bidx, slots].set(
            st["slot_mask"][bidx, slots] | active)
        embeds = llama.embed(params, st["last_token"][:, None])
        hidden, cache = llama.decode_step_rows(
            params, cfg, st["cache"], embeds, slots, slot_mask,
            st["position"])
        logits = llama.logits(params, hidden[:, 0])
        nxt = self._sample(logits, st["temperature"], rng)
        n_gen = st["n_generated"] + active
        out_tok = jnp.where(active, nxt, 0)
        still = active & (nxt != self.eos) & (n_gen < st["max_new"])
        st.update(cache=cache, slot_mask=slot_mask,
                  write_idx=slots + active,
                  position=st["position"] + active,
                  last_token=jnp.where(active, nxt, st["last_token"]),
                  active=still, n_generated=n_gen)
        return st, out_tok, active

    def _step_impl(self, params, state, rng):
        return self._step_body(params, state, rng)

    def _block_impl(self, params, n_steps, state, rng):
        """`n_steps` decode steps as ONE compiled program (lax.scan over
        the step body). One dispatch + one host fetch per n tokens: on
        dispatch-latency-bound backends (the tunneled chip charges ~20 µs
        per op launch and 25 ms+ per host fetch) a per-step host
        round-trip dominates the step() loop — blocking amortizes both.
        Scheduling then runs at block granularity: retirements and
        admissions happen between blocks, so a slot finishing mid-block
        idles at most n-1 steps."""
        def body(st, r):
            st, out_tok, active = self._step_body(params, st, r)
            return st, (out_tok, active)

        st, (toks, actives) = jax.lax.scan(
            body, state, jax.random.split(rng, n_steps))
        return st, toks, actives, st["active"]

    def _mixed_impl(self, params, state, chunk_emb, admit_slot, qlen,
                    final, max_new_admit, temp_admit, rng):
        """One MIXED step (chunked prefill): every active slot decodes
        its next token (q column 0) while `admit_slot` consumes `qlen`
        prompt tokens of `chunk_emb` [q, D]; when `final`, the admitting
        row samples its first generated token from its last chunk
        column. Inactive, non-admitting rows ride along masked."""
        cfg = self.cfg
        st = dict(state)
        active = st["active"]
        bidx = jnp.arange(self.max_slots)
        q = chunk_emb.shape[0]
        is_admit = bidx == admit_slot

        base = llama.embed(params, st["last_token"][:, None])    # [B,1,D]
        tok = jnp.zeros((self.max_slots, q, base.shape[-1]), base.dtype)
        tok = tok.at[:, 0].set(base[:, 0])
        tok = tok.at[admit_slot].set(chunk_emb.astype(base.dtype))
        slots = st["write_idx"]
        hid, cache = llama.decode_mixed_rows(params, cfg, st["cache"],
                                             tok, slots, st["slot_mask"],
                                             st["position"])
        qidx = jnp.where(is_admit, qlen - 1, 0)
        logits = llama.logits(params, hid[bidx, qidx])
        temps = jnp.where(is_admit, temp_admit, st["temperature"])
        nxt = self._sample(logits, temps, rng)

        # decode-row bookkeeping (identical to _step_jit)
        n_gen = st["n_generated"] + active
        out_tok = jnp.where(active, nxt, 0)
        still = active & (nxt != self.eos) & (n_gen < st["max_new"])
        sm = st["slot_mask"].at[bidx, slots].set(
            st["slot_mask"][bidx, slots] | active)
        # admitting row: validate its qlen chunk slots
        ar = jnp.arange(self.max_len)[None]
        admit_start = slots[admit_slot]
        mark = (ar >= admit_start) & (ar < admit_start + qlen)
        sm = jnp.where(is_admit[:, None] & mark, True, sm)
        write_idx = jnp.where(is_admit, admit_start + qlen, slots + active)
        position = st["position"] + jnp.where(is_admit, qlen,
                                              active.astype(jnp.int32))
        first = nxt[admit_slot]
        admit_alive = final & (first != self.eos) & (max_new_admit > 1)
        last_token = jnp.where(active, nxt, st["last_token"])
        last_token = jnp.where(is_admit & final, first, last_token)
        st.update(
            cache=cache, slot_mask=sm, write_idx=write_idx,
            position=position, last_token=last_token,
            active=jnp.where(is_admit, admit_alive, still),
            n_generated=jnp.where(is_admit,
                                  jnp.where(final, 1, 0), n_gen),
            max_new=jnp.where(is_admit, max_new_admit, st["max_new"]),
            temperature=jnp.where(is_admit, temp_admit,
                                  st["temperature"]))
        return st, out_tok, active, first

    def _prefill_impl(self, params, state, embeds, mask, s_bucket, slots,
                      max_new, temp, valid, rng):
        """BATCHED prefill admission: embeds [p, s_bucket, D] admits p
        rows into `slots` [p] in one program — one dispatch and one
        compute-bound prefill for a whole arrival burst instead of p
        serial single-row prefills (prefill at these prompt lengths is
        MXU-bound, so p rows cost barely more than one). Pad rows
        (valid=False) DUPLICATE row 0 — first is forced to first[0] for
        them, so every duplicate scatter write carries identical values
        and slot 0 stays deterministic even under sampling."""
        cfg = self.cfg
        st = dict(state)
        p = embeds.shape[0]
        small = llama.init_cache(cfg, p, s_bucket,
                                 dtype=st["cache"]["k"].dtype,
                                 quant="k_scale" in st["cache"])
        hidden, small = llama.prefill(params, cfg, embeds, mask, small)
        logits = llama.logits(params, hidden[:, -1])
        first = self._sample(logits, temp, rng)
        first = jnp.where(valid, first, first[0])
        # scale planes (int8 KV) merge alongside the value planes; the
        # tail slices adapt to each plane's rank
        cache = {}
        for n, plane in st["cache"].items():
            tails = tuple(slice(0, s) for s in small[n].shape[2:])
            cache[n] = plane.at[(slice(None), slots) + tails].set(small[n])
        row_mask = jnp.zeros((p, self.max_len), bool).at[:, :s_bucket].set(
            mask.astype(bool))
        alive = (first != self.eos) & (max_new > 1)
        st.update(
            cache=cache,
            slot_mask=st["slot_mask"].at[slots].set(row_mask),
            write_idx=st["write_idx"].at[slots].set(
                jnp.full((p,), s_bucket, jnp.int32)),
            position=st["position"].at[slots].set(
                jnp.sum(mask.astype(jnp.int32), axis=1)),
            last_token=st["last_token"].at[slots].set(first),
            active=st["active"].at[slots].set(alive),
            n_generated=st["n_generated"].at[slots].set(
                jnp.ones((p,), jnp.int32)),
            max_new=st["max_new"].at[slots].set(max_new),
            temperature=st["temperature"].at[slots].set(temp),
        )
        return st, first

    # -- public API ----------------------------------------------------------

    def close(self):
        """Release device buffers and compiled programs now. Engines
        also free on garbage collection, but the per-instance jit
        wrappers form a reference cycle with the instance (self -> jit
        -> bound method -> self) that waits on the cycle collector;
        close() breaks it so the KV planes leave HBM deterministically
        (serving restarts, bench re-runs)."""
        for name in ("_step_jit", "_block_jit", "_mixed_jit",
                     "_prefill_jit", "_pack_jit"):
            setattr(self, name, None)
        self.state = None

    def free_slots(self) -> int:
        return sum(r is None for r in self.slot_req)

    def _effective_temp(self, temperature) -> float:
        if temperature is None:
            return self.temperature
        t = float(temperature)
        if t > 0 and not self.sampling:
            raise ValueError(
                "engine compiled greedy-only; construct with "
                "per_request_sampling=True (or a pool temperature > 0) "
                "to accept sampled requests")
        return t

    def submit(self, inputs_embeds, attention_mask, max_new: int,
               temperature: Optional[float] = None) -> int:
        """Admit one request (embeds [1, S, D], mask [1, S]). Returns id.

        Prompts within the prefill buckets run one dedicated prefill; the
        first generated token samples from its logits here and subsequent
        tokens come from step(). With chunk_size set, longer prompts park
        as a CHUNKED admission instead: step() streams them into the slot
        chunk_size tokens per mixed step while every other slot keeps
        decoding (no prefill stall), and the first token arrives with the
        final chunk. `temperature` overrides the pool default for this
        request (needs per_request_sampling=True; 0 = greedy row)."""
        slot = self.slot_req.index(None)   # raises ValueError when full
        temp = self._effective_temp(temperature)
        s = inputs_embeds.shape[1]
        if self.chunk_size and s > self.buckets[-1]:
            return self._submit_chunked(slot, inputs_embeds,
                                        attention_mask, max_new, temp)
        first, req = self._prefill_rows(
            [(inputs_embeds, attention_mask, max_new, temp)], [slot])
        req, first = req[0], int(first[0])
        req.tokens.append(first)
        if first == self.eos or max_new <= 1:
            req.done = True
        else:
            self.slot_req[slot] = req.req_id
        return req.req_id

    def submit_many(self, reqs) -> List[int]:
        """Admit several requests at once: (embeds, mask, max_new[,
        temperature]) tuples, at most free_slots() of them. One BATCHED
        prefill program runs per prompt bucket, and no first-token host
        fetch happens here — first tokens stay on device until the next
        record (submit() costs a blocking ~25ms+ fetch per call on the
        tunnel; a serving dispatcher admitting an arrival burst should
        use this). Chunked admissions (prompts beyond the buckets, with
        chunk_size set) fall through to their streaming path."""
        if len(reqs) > self.free_slots():
            raise ValueError(f"{len(reqs)} requests > {self.free_slots()} "
                             "free slots")
        ids: List[Optional[int]] = [None] * len(reqs)
        groups: Dict[int, List] = {}
        free = [i for i, r in enumerate(self.slot_req) if r is None]
        for j, r in enumerate(reqs):
            embeds, mask, max_new = r[:3]
            temp = self._effective_temp(r[3] if len(r) > 3 else None)
            s = embeds.shape[1]
            if self.chunk_size and s > self.buckets[-1]:
                ids[j] = self._submit_chunked(
                    free.pop(0), embeds, mask, max_new, temp)
                continue
            groups.setdefault(_bucket(s, self.buckets), []).append(
                (j, (embeds, mask, max_new, temp)))
        cap = self.max_prefill_rows or len(reqs) or 1
        for s_b, group in groups.items():
            for at in range(0, len(group), cap):
                sub = group[at:at + cap]
                slots = [free.pop(0) for _ in sub]
                firsts, group_reqs = self._prefill_rows(
                    [row for _, row in sub], slots)
                for i, (req, slot) in enumerate(zip(group_reqs, slots)):
                    req.tokens.append(firsts[i])   # device scalar: deferred
                    self.slot_req[slot] = req.req_id
                    ids[sub[i][0]] = req.req_id
        return ids

    def _prefill_rows(self, group, slots):
        """Shared batched-prefill dispatch: pad the group to a power-of
        -two row count by duplicating row 0, run one prefill program,
        return (firsts [p], requests). Bumps each slot's generation."""
        s_b = _bucket(max(e.shape[1] for e, *_ in group), self.buckets)
        n = len(group)
        p = 1 << (n - 1).bit_length()
        rows, masks, max_news, temps = [], [], [], []
        for embeds, mask, max_new, temp in group:
            if s_b + max_new > self.max_len:
                raise ValueError("prompt bucket + max_new exceeds max_len")
            pad = s_b - embeds.shape[1]
            rows.append(jnp.pad(embeds, ((0, 0), (pad, 0), (0, 0)))[0])
            masks.append(jnp.pad(mask, ((0, 0), (pad, 0)))[0])
            max_news.append(max_new)
            temps.append(temp)
        for _ in range(p - n):                   # duplicate row 0
            rows.append(rows[0])
            masks.append(masks[0])
            max_news.append(max_news[0])
            temps.append(temps[0])
        self._rng, sub = jax.random.split(self._rng)
        self.state, firsts = self._prefill_jit(
            self.params, self.state, jnp.stack(rows), jnp.stack(masks),
            s_b,
            jnp.asarray(list(slots) + [slots[0]] * (p - n), jnp.int32),
            jnp.asarray(max_news, jnp.int32),
            jnp.asarray(temps, jnp.float32),
            jnp.asarray([i < n for i in range(p)]), sub)
        group_reqs = []
        for (embeds, _, max_new, _), slot in zip(group, slots):
            req = _Request(next(self._ids), embeds.shape[1], max_new)
            self.requests[req.req_id] = req
            self._slot_gen[slot] += 1
            self._dispatched[slot] = 1          # the prefill's first token
            group_reqs.append(req)
        return firsts, group_reqs

    def retirements_pending(self) -> bool:
        """True when some occupied slot has already been DISPATCHED its
        whole budget — its retirement is sitting in an unrecorded block.
        A scheduler holding work should record that block synchronously
        (instead of double-buffering past it) so the slot refills
        immediately; otherwise it idles through the next block too."""
        return any(rid is not None
                   and self._dispatched[slot]
                   >= self.requests[rid].max_new
                   for slot, rid in enumerate(self.slot_req))

    def suggested_block(self, max_steps: int, floor: int = 4) -> int:
        """Budget-aware block size: the step count until the earliest
        possible budget retirement among occupied slots (EOS can retire
        a row sooner — budgets are the known upper bound), clamped to
        [floor, max_steps]. Blocks then END at scheduled retirements,
        so freed slots refill immediately instead of idling to a fixed
        block boundary (the measured occupancy waste of the fixed-16
        serving lane)."""
        rems = [self.requests[rid].max_new - self._dispatched[slot]
                for slot, rid in enumerate(self.slot_req)
                if rid is not None]
        rems = [r for r in rems if r > 0]
        if not rems:
            return floor
        return max(floor, min(max_steps, min(rems)))

    def _submit_chunked(self, slot: int, inputs_embeds, attention_mask,
                        max_new: int, temp: float = 0.0) -> int:
        import numpy as np
        valid = np.asarray(attention_mask[0]).astype(bool)
        emb = np.asarray(inputs_embeds[0])[valid]        # drop padding
        s = emb.shape[0]
        if s + max_new > self.max_len:
            raise ValueError("prompt + max_new exceeds max_len")
        # reset the slot's device state; the admission streams from 0
        st = dict(self.state)
        st["slot_mask"] = st["slot_mask"].at[slot].set(False)
        for key, val in (("write_idx", 0), ("position", 0),
                         ("active", False), ("n_generated", 0)):
            st[key] = st[key].at[slot].set(val)
        self.state = st
        req = _Request(next(self._ids), s, max_new)
        self.requests[req.req_id] = req
        self._slot_gen[slot] += 1
        self.slot_req[slot] = req.req_id      # reserve through admission
        self._admissions.append({"req": req, "slot": slot, "embeds": emb,
                                 "offset": 0, "max_new": max_new,
                                 "temp": temp})
        return req.req_id

    def _step_mixed(self) -> int:
        """One mixed step: head admission consumes a chunk, everyone else
        decodes. Returns #decode slots advanced."""
        import numpy as np
        a = self._admissions[0]
        q = self.chunk_size
        chunk = a["embeds"][a["offset"]:a["offset"] + q]
        qlen = chunk.shape[0]
        final = a["offset"] + qlen >= a["embeds"].shape[0]
        if qlen < q:
            chunk = np.pad(chunk, ((0, q - qlen), (0, 0)))
        self._rng, sub = jax.random.split(self._rng)
        self.state, out_tok, was_active, first = self._mixed_jit(
            self.params, self.state, jnp.asarray(chunk),
            jnp.int32(a["slot"]), jnp.int32(qlen), final,
            jnp.int32(a["max_new"]), jnp.float32(a.get("temp", 0.0)), sub)
        for slot, rid in enumerate(self.slot_req):
            if rid is not None and slot != a["slot"]:
                self._dispatched[slot] += 1
        advanced = self._record(out_tok, was_active)
        a["offset"] += qlen
        if final:
            self._admissions.pop(0)
            req = a["req"]
            self._dispatched[a["slot"]] = 1
            first = int(first)
            req.tokens.append(first)
            if first == self.eos or a["max_new"] <= 1:
                req.done = True
                self.slot_req[a["slot"]] = None
        return advanced

    def _record(self, out_tok, was_active) -> int:
        """Append each advanced slot's token; retire finished ones."""
        import numpy as np
        out_tok = np.asarray(out_tok)
        was_active = np.asarray(was_active)
        still = np.asarray(self.state["active"])
        advanced = 0
        for slot, rid in enumerate(self.slot_req):
            if rid is None:
                continue
            req = self.requests[rid]
            if was_active[slot]:
                advanced += 1
                req.tokens.append(int(out_tok[slot]))
            elif not req.tokens:
                continue    # chunked admission still streaming its prompt
            # a deferred admission (submit_many) whose first token was
            # EOS (or max_new <= 1) was never active: `still` is current
            # state here (sync path), so retire it now
            if not still[slot]:
                req.done = True
                self.slot_req[slot] = None
        return advanced

    def drain_admissions(self) -> int:
        """Dispatch mixed steps for EVERY queued chunked admission
        back-to-back WITHOUT per-step host fetches, then replay the
        bookkeeping after one combined fetch.

        step() fetches after every chunk; on dispatch-latency-bound
        backends (the tunneled TPU: 25 ms .. seconds per fetch) that
        made chunked admission ~10× slower than its own compute
        (measured r5: a 16-slot 1k-prompt GQA pool spent 198 s/run in
        192 synchronous mixed-step fetches vs ~40 s compute). Device
        programs queue asynchronously, so N chunks cost N dispatches +
        ONE fetch. Bookkeeping replays in dispatch order; decode rows
        that finish mid-drain retire from the post-drain active flags
        (same outcome as per-step retirement — no admission targets an
        occupied slot). Returns the number of mixed steps dispatched."""
        if not self._admissions:
            return 0
        import numpy as np
        recs = []
        while self._admissions:
            a = self._admissions[0]
            q = self.chunk_size
            chunk = a["embeds"][a["offset"]:a["offset"] + q]
            qlen = chunk.shape[0]
            final = a["offset"] + qlen >= a["embeds"].shape[0]
            if qlen < q:
                chunk = np.pad(chunk, ((0, q - qlen), (0, 0)))
            self._rng, sub = jax.random.split(self._rng)
            self.state, out_tok, was_active, first = self._mixed_jit(
                self.params, self.state, jnp.asarray(chunk),
                jnp.int32(a["slot"]), jnp.int32(qlen), final,
                jnp.int32(a["max_new"]), jnp.float32(a.get("temp", 0.0)),
                sub)
            for slot, rid in enumerate(self.slot_req):
                if rid is not None and slot != a["slot"]:
                    self._dispatched[slot] += 1
            recs.append((out_tok, was_active, first, final, a))
            a["offset"] += qlen
            if final:
                self._admissions.pop(0)
                self._dispatched[a["slot"]] = 1
        fetched = jax.device_get(
            [(r[0], r[1], r[2]) for r in recs] + [self.state["active"]])
        still = np.asarray(fetched[-1]).astype(bool)
        for (_, _, _, final, a), (out_tok, was_active, first) in zip(
                recs, fetched[:-1]):
            was_active = np.asarray(was_active).astype(bool)
            out_tok = np.asarray(out_tok)
            for slot, rid in enumerate(self.slot_req):
                if rid is not None and was_active[slot]:
                    self.requests[rid].tokens.append(int(out_tok[slot]))
            if final:
                req = a["req"]
                first = int(first)
                req.tokens.append(first)
                if first == self.eos or a["max_new"] <= 1:
                    req.done = True
                    self.slot_req[a["slot"]] = None
        for slot, rid in enumerate(self.slot_req):
            if rid is not None and not still[slot] \
                    and self.requests[rid].tokens:
                self.requests[rid].done = True
                self.slot_req[slot] = None
        return len(recs)

    def step(self) -> int:
        """Advance every active slot one token. Returns #slots advanced."""
        if self._admissions:
            return self._step_mixed()
        self._rng, sub = jax.random.split(self._rng)
        for slot, rid in enumerate(self.slot_req):
            if rid is not None:
                self._dispatched[slot] += 1
        self.state, out_tok, was_active = self._step_jit(
            self.params, self.state, sub)
        return self._record(out_tok, was_active)

    def step_block(self, n_steps: int):
        """Dispatch `n_steps` decode steps as one program; returns an
        opaque block result for record_block.

        The result's arrays are unfetched device buffers — callers may
        dispatch the NEXT block before recording this one, overlapping
        the host fetch (and the scheduler's Python work) with device
        compute (double buffering; see bench.py's serving lane). Chunked
        admissions must be drained first (step() handles those)."""
        if self._admissions:
            raise RuntimeError(
                "chunked admissions in flight; drain with step() first")
        self._rng, sub = jax.random.split(self._rng)
        self.state, toks, actives, still = self._block_jit(
            self.params, n_steps, self.state, sub)
        for slot, rid in enumerate(self.slot_req):
            if rid is not None:
                self._dispatched[slot] += n_steps
        packed = self._pack_jit(toks, actives, still)
        return packed, n_steps, tuple(self._slot_gen)

    def record_block(self, block) -> int:
        """Fetch + bookkeep one step_block result (ONE host fetch of the
        packed array): append each advanced slot's tokens, retire slots
        that finished within the block. Returns the number of (slot,
        step) advances recorded. Only slots whose admission generation
        matches the block's dispatch-time snapshot are touched — a stale
        double-buffered block must not retire a request admitted after
        it was dispatched."""
        return self.record_blocks([block])

    def record_blocks(self, blocks) -> int:
        """Record several queued step_block results with one combined
        host fetch per block (a scheduler that defers recording until a
        predicted retirement — suggested_block/retirements_pending —
        drains its queue here). Blocks must be in dispatch order; slots
        admitted mid-queue are handled by the per-block gen snapshots."""
        advanced = 0
        # one device_get for the whole queue: transfers issue together
        # instead of one blocking round-trip per block
        fetched = jax.device_get([b[0] for b in blocks])
        for packed, (_, n_steps, gens) in zip(fetched, blocks):
            toks = packed[:n_steps]
            actives = packed[n_steps:2 * n_steps].astype(bool)
            still = packed[2 * n_steps].astype(bool)
            for slot, rid in enumerate(self.slot_req):
                if rid is None or gens[slot] != self._slot_gen[slot]:
                    continue
                req = self.requests[rid]
                live = actives[:, slot]
                if live.any():
                    req.tokens.extend(int(t) for t in toks[live, slot])
                    advanced += int(live.sum())
                # gen match ⇒ this block ran after the admission, so
                # `still` speaks for the current request — including a
                # deferred admission that EOS'd on its first token
                if not still[slot]:
                    req.done = True
                    self.slot_req[slot] = None
        return advanced

    def finished(self) -> Dict[int, List[int]]:
        """Drain completed requests: {req_id: generated token ids}.
        Deferred first tokens (submit_many) materialize here."""
        out = {}
        for rid in [r for r, q in self.requests.items() if q.done]:
            out[rid] = [int(t) for t in self.requests.pop(rid).tokens]
        return out

    def run_until_drained(self, max_steps: int = 10_000):
        for _ in range(max_steps):
            if (self.step() == 0 and not self._admissions
                    and all(r is None for r in self.slot_req)):
                break
        return self.finished()
