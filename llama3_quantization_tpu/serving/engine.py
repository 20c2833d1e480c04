"""Continuous-batching serving engine (single host).

The reference has no serving at all (SURVEY.md: "offline research
harness"); the BASELINE north star asks for continuous batching. This
engine keeps a fixed pool of KV-cache slots and advances ALL active
sequences with one jitted `decode_step_multi` per step:

- `add_request(prompt)` claims a free slot, prefills it in place (the slot's
  cache rows are sliced out, prefilled with the standard `decode_step`, and
  written back), and schedules decoding;
- `step()` runs one batched decode across active slots (each at its own
  position in its own ring window) and returns newly generated tokens;
- finished requests free their slots immediately — new requests join the
  batch without stopping decoding (continuous batching).

Prefill programs are compiled per bucketed prompt length; the decode
program is compiled once for the slot pool.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.configs import ModelConfig
from ..models.transformer import (
    NO_QUANT,
    RuntimeQuantConfig,
    decode_step,
    decode_step_multi,
    init_kv_cache,
)


@dataclasses.dataclass
class _Request:
    rid: int
    slot: int
    prompt_len: int
    max_new_tokens: int
    generated: List[int] = dataclasses.field(default_factory=list)
    eos_id: Optional[int] = None
    done: bool = False
    #: tokens scheduled on device so far (prefill first token + dispatched
    #: windows) — lets the pipelined loop free budget-bound slots at
    #: DISPATCH time instead of one window later (see run_pipelined)
    scheduled: int = 0
    #: slot already returned to the free pool (guards double-free when a
    #: pre-freed request's late-collected finish calls _finish)
    freed: bool = False


class ServingEngine:
    def __init__(
        self,
        params,
        cfg: ModelConfig,
        max_slots: int = 8,
        max_len: int = 512,
        rq: RuntimeQuantConfig = NO_QUANT,
        quantized_cache=False,  # False | True/8 (int8) | 4 (int4-packed)
        sink_tokens: int = 0,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        fuse: bool = False,
        schedule: str = "fifo",
    ):
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        if fuse:
            # horizontal qkv/gateup fusion (quant.serving.fuse_for_decode):
            # fewer weight dots per decode step; single-replica only
            from ..quant.serving import fuse_for_decode

            params = fuse_for_decode(params, cfg)
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_len = max_len
        self.cache = init_kv_cache(cfg, max_slots, max_len, quantized=quantized_cache)
        self._quantized_cache = quantized_cache
        self._scratch: Dict[int, dict] = {}
        self._decode = jax.jit(
            partial(decode_step_multi, cfg=cfg, rq=rq, sink_tokens=sink_tokens)
        )
        self._rq, self._sink_tokens = rq, sink_tokens
        self._decode_n = None  # built lazily by step_n
        self._decode_win: Dict[int, object] = {}  # windowed step_n per k
        self._prefill = jax.jit(
            partial(decode_step, cfg=cfg, rq=rq, sink_tokens=sink_tokens)
        )
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self._key = jax.random.PRNGKey(seed)
        from ..models.transformer import sample_logits

        self._sample = jax.jit(
            partial(sample_logits, temperature=temperature, top_k=top_k, top_p=top_p)
        )
        self.pos = np.zeros(max_slots, np.int64)  # next write position
        self.next_tok = np.zeros(max_slots, np.int64)
        self.free: List[int] = list(range(max_slots))
        self.requests: Dict[int, _Request] = {}
        self._slot_req: Dict[int, int] = {}
        self._next_rid = 0
        if schedule not in ("fifo", "ljf"):
            raise ValueError(schedule)
        #: admission policy for the submit queue: "fifo" (arrival order) or
        #: "ljf" (longest-job-first by max_new_tokens — minimizes the drain
        #: tail when generation budgets are known; classic LPT scheduling)
        self.schedule = schedule
        self._queue: List = []  # submitted-not-yet-admitted requests
        # async-admission state (run_pipelined): device first-token arrays
        # awaiting host resolution / scatter into the next window's tok0
        self._first_pending: List = []
        self._scatter_next: List = []

        def _splice(cache, slot_cache, slot):
            return {
                k: jax.lax.dynamic_update_slice(
                    cache[k],
                    slot_cache[k].astype(cache[k].dtype),
                    (0, slot) + (0,) * (cache[k].ndim - 2),
                )
                for k in cache
            }

        # donated: the pool buffers update in place instead of 2-4 whole-
        # cache device copies per admission
        self._splice = jax.jit(_splice, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _slot_cache(self, slot: int):
        return {
            k: v[:, slot : slot + 1] for k, v in self.cache.items()
        }

    def _batch_cache(self, n: int):
        """Zeroed scratch cache with n batch rows for batched prefill
        (memoized per n; every readable position is overwritten before the
        ring mask admits it, so zeros are as good as the slot contents)."""
        if n not in self._scratch:
            self._scratch[n] = init_kv_cache(
                self.cfg, n, self.max_len, quantized=self._quantized_cache
            )
        return self._scratch[n]

    def _write_slot_cache(self, slot: int, slot_cache) -> None:
        self.cache = self._splice(self.cache, slot_cache, self._jnp.int32(slot))

    # ------------------------------------------------------------------
    def _bucket(self, prompt_len: int) -> int:
        # pad to a power-of-2 bucket so prefill compiles per bucket, not per
        # exact prompt length; padded rows sit at positions >= prompt_len,
        # which the position mask excludes until real writes replace them
        bucket = 16
        while bucket < prompt_len:
            bucket *= 2
        return min(bucket, self.max_len - 1)

    def add_request(
        self,
        prompt_tokens: Sequence[int],
        max_new_tokens: int = 64,
        eos_id: Optional[int] = None,
    ) -> int:
        """Claim a slot, prefill, return the request id."""
        return self.add_requests([(prompt_tokens, max_new_tokens, eos_id)])[0]

    def add_requests(self, requests) -> List[int]:
        """Admit a batch of (prompt_tokens, max_new_tokens, eos_id) at once.

        The WHOLE batch prefills in ONE forward at a FIXED batch of
        `max_slots` rows, padded to the LARGEST prompt-length bucket
        present (one compiled program per bucket, ever — not per
        admission pattern). In the measured short-prompt serving regime
        (buckets <= 64) every prefill dispatch is weight-read-bound, so
        merging buckets into one dispatch only adds padded FLOPs on the
        shorter prompts and is strictly cheaper than per-bucket
        prefills; with a prompt whose bucket approaches max_len the
        quadratic attention FLOPs of the large bucket can invert that —
        callers mixing very long prompts into a batch may prefer
        per-request `submit`. Under churn the
        engine admits several requests per free-slot window; per-request
        (and per-bucket) prefills serialized between decode windows were
        a measured occupancy cost. Row i's cache is spliced into its
        slot; extra padded rows are discarded."""
        if len(requests) > len(self.free):
            raise RuntimeError(
                f"{len(requests)} requests for {len(self.free)} free slots"
            )
        jnp = self._jnp
        for prompt, _, _ in requests:
            if len(prompt) >= self.max_len:
                raise ValueError(
                    f"prompt of {len(prompt)} tokens does not fit max_len="
                    f"{self.max_len}; truncate explicitly or raise max_len"
                )
        rids: Dict[int, int] = {}
        if requests:
            bucket = self._bucket(max(len(p) for p, _, _ in requests))
            idxs = list(range(len(requests)))
            # FIXED prefill batch (= max_slots): one compiled program per
            # bucket, ever. A per-admission row count compiles a fresh
            # program per (count, bucket) pair — measured 341 -> 126 tok/s
            # at the serve bench, the compiles landing inside the measured
            # window. Padding rows are wasted prefill FLOPs, which at
            # bucket <= 64 cost less than one decode step.
            npad = self.max_slots
            toks_np = np.zeros((npad, bucket), np.int32)
            for row, i in enumerate(idxs):
                prompt = np.asarray(requests[i][0], np.int32)
                toks_np[row, : len(prompt)] = prompt
            batch_cache = self._batch_cache(npad)
            logits, batch_cache = self._prefill(
                self.params, batch_cache, jnp.asarray(toks_np), jnp.int32(0)
            )
            # ONE device->host transfer for all rows' next tokens (the
            # per-row int() sync cost a tunnel round-trip each), at FIXED
            # shape npad so the gather/argmax program compiles once — a
            # len(idxs)-shaped gather compiles per admission count
            last_np = np.zeros(npad, np.int64)
            for row, i in enumerate(idxs):
                last_np[row] = len(requests[i][0]) - 1
            nxts = np.asarray(
                self._pick(logits[jnp.arange(npad), jnp.asarray(last_np), :])
            )
            for row, i in enumerate(idxs):
                prompt, max_new, eos_id = requests[i]
                plen = len(prompt)
                slot = self.free.pop()
                self._write_slot_cache(
                    slot,
                    {k: v[:, row : row + 1] for k, v in batch_cache.items()},
                )
                nxt = int(nxts[row])
                rid = self._next_rid
                self._next_rid += 1
                req = _Request(rid, slot, plen, max_new, [nxt], eos_id,
                               scheduled=1)
                self.requests[rid] = req
                self._slot_req[slot] = rid
                self.pos[slot] = plen
                self.next_tok[slot] = nxt
                if eos_id is not None and nxt == eos_id:
                    self._finish(req)
                rids[i] = rid
        return [rids[i] for i in range(len(requests))]

    def _pick(self, logits):
        """Greedy by default; seeded sampling when temperature > 0."""
        if self.temperature <= 0.0:
            return self._jnp.argmax(logits, axis=-1)
        self._key, sub = self._jax.random.split(self._key)
        return self._sample(logits, sub)

    def _finish(self, req: _Request) -> None:
        req.done = True
        self._release_slot(req)

    def _release_slot(self, req: _Request) -> None:
        if not req.freed:
            req.freed = True
            self._slot_req.pop(req.slot, None)
            self.free.append(req.slot)

    def _prefree_scheduled(self) -> None:
        """Free slots whose request is fully scheduled on device (budget-
        bound, eos-less): the in-flight window already contains its final
        tokens, so the slot can take a new admission NOW — one window
        earlier than waiting for the collect boundary to notice the
        finish. Token bookkeeping still happens at collect time (`freed`
        guards the double-free)."""
        for slot, rid in list(self._slot_req.items()):
            req = self.requests[rid]
            if req.eos_id is None and req.scheduled >= req.max_new_tokens:
                self._release_slot(req)

    # ------------------------------------------------------------------
    def step(self) -> Dict[int, int]:
        """Advance every active sequence one token; returns {rid: token}."""
        if not self._slot_req:
            return {}
        jnp = self._jnp
        tokens = jnp.asarray(self.next_tok[:, None].astype(np.int32))
        pos = jnp.asarray(self.pos.astype(np.int32))
        logits, self.cache = self._decode(self.params, self.cache, tokens, pos)
        nxt = np.asarray(self._pick(logits[:, 0, :]))
        out: Dict[int, int] = {}
        for slot, rid in list(self._slot_req.items()):
            req = self.requests[rid]
            tok = int(nxt[slot])
            req.generated.append(tok)
            self.pos[slot] += 1
            self.next_tok[slot] = tok
            out[rid] = tok
            if (req.eos_id is not None and tok == req.eos_id) or len(
                req.generated
            ) >= req.max_new_tokens:
                self._finish(req)
        return out

    def step_n(self, k: int) -> Dict[int, List[int]]:
        """Advance every active sequence up to k tokens in ONE dispatch.

        The per-step host round-trip dominates short steps on remote-
        attached chips (measured 48 ms/step vs 13.9 ms device time at 8
        slots through the axon tunnel); a k-step on-device `lax.scan`
        amortizes it. Finishes (eos / max_new_tokens) are processed at the
        window boundary: a slot that finishes mid-window simply ignores its
        trailing tokens, and slot reuse splices a freshly prefilled cache
        over whatever the dead steps wrote. Greedy and seeded-sampling
        paths both stay on device (sampling folds the step index into the
        key)."""
        if not self._slot_req:
            return {}
        jax, jnp = self._jax, self._jnp
        tok0 = jnp.asarray(self.next_tok[:, None].astype(np.int32))
        pos0 = jnp.asarray(self.pos.astype(np.int32))
        self._key, sub = jax.random.split(self._key)
        toks, layout = self._dispatch_window(k, tok0, pos0, sub)
        arr = np.asarray(toks)
        if layout == "bk":
            arr = arr.T  # -> [k, B]
        return self._collect_step_n(arr, k)

    def _build_decode_n(self) -> None:
        if self._decode_n is not None:
            return
        from functools import partial as _partial

        from ..models.transformer import decode_step_multi, sample_logits

        jax, jnp = self._jax, self._jnp
        cfg, rq, sink = self.cfg, self._rq, self._sink_tokens
        temp, tk, tp = self.temperature, self.top_k, self.top_p

        @_partial(jax.jit, static_argnames=("k",), donate_argnums=(1,))
        def decode_n(params, cache, tok0, pos0, key, k):
            from ..ops.matmul import prepare_decode_params

            params = prepare_decode_params(params)  # s4: prep off-scan

            def body(carry, i):
                tok, pos, cache = carry
                logits, cache = decode_step_multi(
                    params, cache, tok, pos, cfg=cfg, rq=rq, sink_tokens=sink
                )
                lg = logits[:, 0, :]
                if temp <= 0.0:
                    nxt = jnp.argmax(lg, axis=-1)
                else:
                    nxt = sample_logits(
                        lg, jax.random.fold_in(key, i),
                        temperature=temp, top_k=tk, top_p=tp,
                    )
                nxt = nxt.astype(jnp.int32)
                return (nxt[:, None], pos + 1, cache), nxt

            (_, _, cache), toks = jax.lax.scan(
                body, (tok0, pos0, cache), jnp.arange(k)
            )
            return toks, cache  # toks [k, B]

        self._decode_n = decode_n

    def _collect_step_n(self, toks, k: int) -> Dict[int, List[int]]:
        """Distribute a [k, B] token window to requests; finishes at the
        window boundary (mid-window finishers drop trailing tokens)."""
        out: Dict[int, List[int]] = {}
        for slot, rid in list(self._slot_req.items()):
            req = self.requests[rid]
            taken: List[int] = []
            for i in range(k):
                tok = int(toks[i, slot])
                req.generated.append(tok)
                taken.append(tok)
                self.pos[slot] += 1
                self.next_tok[slot] = tok
                if (req.eos_id is not None and tok == req.eos_id) or len(
                    req.generated
                ) >= req.max_new_tokens:
                    self._finish(req)
                    break
            out[rid] = taken
        return out

    # ------------------------------------------------------------------
    def _dispatch_window(self, k: int, tok0, pos0, sub):
        """Dispatch one k-step decode window (windowed write-combined path
        when applicable, else the scan fallback) WITHOUT fetching results.
        Returns the device token array ([B, k] or [k, B] — see
        `_window_rows`)."""
        jax = self._jax
        from ..models.windowed import decode_window, windowed_ok

        active = list(self._slot_req)
        fits_ring = k < self.max_len and all(
            self.pos[s] + k <= self.max_len for s in active
        )
        if fits_ring and windowed_ok(
            self.cfg, self.cache, self._rq, self._sink_tokens
        ):
            if self._decode_win.get(k) is None:
                from functools import partial as _partial

                self._decode_win[k] = jax.jit(
                    _partial(
                        decode_window, n_steps=k, cfg=self.cfg, rq=self._rq,
                        temperature=self.temperature, top_k=self.top_k,
                        top_p=self.top_p, sink_tokens=self._sink_tokens,
                    ),
                    donate_argnums=(1,),
                )
            toks, self.cache = self._decode_win[k](
                self.params, self.cache, tok0, pos0, sample_key=sub
            )
            return toks, "bk"  # [B, k]
        self._build_decode_n()
        toks, self.cache = self._decode_n(
            self.params, self.cache, tok0, pos0, sub, k
        )
        return toks, "kb"  # [k, B]

    def run_pipelined(self, step_tokens: int, max_windows: int = 10**6) -> None:
        """Continuous batching with the host hidden behind the device:
        window i+1 is dispatched from DEVICE-resident token state before
        window i's tokens are fetched, so the per-window host work (result
        sync + python bookkeeping + admission prefill, ~60 ms through a
        remote-attached chip) overlaps device compute instead of idling it.

        GREEDY output tokens match the sequential `step_n` loop exactly
        (same cache chain, same argmax — tested). Sampled (temperature>0)
        streams are window-partition-dependent: the drain-tail clamp
        varies window sizes, which changes the per-window
        `jax.random.split` count and fold_in step indices, so a sampled
        run need not match a fixed-k sequential run token-for-token
        (both are valid draws from the same per-step distributions).
        Beyond that, what changes is only when the host LEARNS of a
        finish. Budget-bound requests (eos_id=None) are freed at DISPATCH
        time the moment their final window is in flight
        (`_prefree_scheduled`), so their slots re-admit with no idle
        window at all; eos finishes are still discovered one window late.
        Slot reuse splices a fresh prefill over the speculative window's
        dead writes (the same mechanism mid-window finishes already use).
        The drain tail additionally clamps the dispatch window to the
        largest remaining budget (rounded down into `_window_sizes`, the
        residual decoding as further shrinking windows) so the last
        windows stop paying dead decode steps.
        """
        import os as _os
        import time as _time

        dbg = _os.environ.get("L3Q_SERVE_DEBUG") == "1"
        t_disp = t_coll = t_adm = 0.0
        jax, jnp = self._jax, self._jnp
        k = step_tokens
        prev = None  # (toks_dev, layout, slotmap, k) at dispatch time
        self._admissions_async()  # admit queued work upfront (no sync)
        dev_last = None  # [B, 1] device tokens chained from the last window
        windows = 0
        while (
            self._slot_req or prev is not None or self._queue
        ) and windows < max_windows:
            self._prefree_scheduled()  # fully-scheduled slots admit NOW
            self._admissions_async()
            if self._slot_req:
                _t0 = _time.time()
                tok0 = (
                    dev_last
                    if dev_last is not None
                    else jnp.zeros((self.max_slots, 1), jnp.int32)
                )
                # newly admitted slots: first tokens merged straight from
                # the prefill argmax device arrays — never fetched. FIXED
                # [B]-shaped gather+where (a variable-length scatter
                # compiles per admission pattern — measured compile storm)
                for nxts_dev, slotmap in self._scatter_next:
                    rows = np.zeros(self.max_slots, np.int32)
                    sel = np.zeros((self.max_slots, 1), bool)
                    for s, (row, _rid) in slotmap.items():
                        rows[s] = row
                        sel[s] = True
                    tok0 = jnp.where(
                        jnp.asarray(sel),
                        nxts_dev[jnp.asarray(rows)][:, None],
                        tok0,
                    )
                self._scatter_next = []
                pos0 = jnp.asarray(self.pos.astype(np.int32))
                self._key, sub = jax.random.split(self._key)
                # drain-tail clamp: no active request can need more than
                # its remaining budget (eos can only finish EARLIER), so
                # shrink the window to the largest remaining budget,
                # rounded DOWN into a small candidate set {1,2,4,...,k}
                # (bounds the number of compiled window programs). The
                # residual decodes as further shrinking windows — e.g.
                # remaining 11 runs 8+2+1 — so the pacing slot finishes
                # exactly at a window boundary with zero dead steps. In
                # steady state max(remaining) >= k and nothing changes.
                rem = [
                    self.requests[rid].max_new_tokens
                    - self.requests[rid].scheduled
                    for rid in self._slot_req.values()
                ]
                # round-5 NEGATIVE result, kept as an A/B knob: clamping
                # to the MINIMUM remaining budget (so every finish lands
                # on a window boundary with zero dead slot-steps) was
                # measured strictly WORSE — 8 slots 639 -> 550 tok/s,
                # 32 slots 1642 -> 1032 — because each finish then
                # fragments everyone's window into the 8/4/2/1 ladder and
                # the per-window costs (host bookkeeping, merge, window-
                # segment attention) exceed the ~k/2 dead slot-steps
                # saved. The max-remaining clamp (drain-tail only) stays
                # the default; L3Q_SERVE_CLAMP=min re-tests.
                pick = min if _os.environ.get("L3Q_SERVE_CLAMP") == "min" else max
                target = min(k, max(1, pick(rem) if rem else k))
                # ring-headroom clamp (round 5): as a slot nears the ring
                # end, SHRINK the window into the candidate set so the
                # windowed fast path keeps fitting, instead of letting
                # _dispatch_window's fits_ring gate collapse every late
                # window to the per-step scan (one host round-trip per
                # token — measured 32-slot kv8 at max_len 256: 1519 tok/s
                # from exactly this). headroom <= 0 means a slot already
                # lives past the ring (eviction regime): keep k and let
                # the per-step path handle it. Only applied when the
                # windowed path exists at all — shrinking windows for the
                # per-step path just adds host syncs.
                from ..models.windowed import windowed_ok as _wok

                if self._slot_req and _wok(
                    self.cfg, self.cache, self._rq, self._sink_tokens
                ):
                    headroom = int(
                        self.max_len
                        - max(self.pos[s] for s in self._slot_req)
                    )
                    if headroom >= 1:
                        target = min(target, headroom)
                k_eff = max(c for c in self._window_sizes(k) if c <= target)
                toks, layout = self._dispatch_window(k_eff, tok0, pos0, sub)
                dev_last = (
                    toks[:, -1:] if layout == "bk" else toks[-1, :, None]
                ).astype(jnp.int32)
                cur = (toks, layout, dict(self._slot_req), k_eff)
                self.pos += k_eff  # every row advanced (dead rows harmless:
                #                    slot reuse splices over their writes)
                for rid in self._slot_req.values():
                    self.requests[rid].scheduled += k_eff
                windows += 1
                t_disp += _time.time() - _t0
            else:
                cur = None
            if prev is not None:
                toks_p, layout_p, slotmap, k_p = prev
                _t1 = _time.time()
                arr = np.asarray(toks_p)  # sync window i; device runs i+1
                if layout_p == "bk":
                    arr = arr.T  # -> [k, B]
                _t2 = _time.time()
                self._resolve_first_tokens()
                self._collect_pipelined(arr, k_p, slotmap)
                self._admissions_async()
                t_coll += _t2 - _t1
                t_adm += _time.time() - _t2
            prev = cur
        self._resolve_first_tokens()
        if dbg:
            import sys as _sys
            print(
                f"run_pipelined: {windows} windows, dispatch {t_disp:.2f}s, "
                f"result-sync {t_coll:.2f}s, collect+admit {t_adm:.2f}s",
                file=_sys.stderr,
            )

    @staticmethod
    def _window_sizes(k: int) -> List[int]:
        """Allowed dispatch-window sizes (ascending): powers of two up to
        k, plus k itself — the compile-bounded candidate set the drain-
        tail clamp rounds DOWN into (max candidate <= the remaining
        budget; the residual decodes as further shrinking windows, so the
        drain never pays dead decode steps)."""
        sizes = []
        c = 1
        while c < k:
            sizes.append(c)
            c *= 2
        sizes.append(k)
        return sizes

    def _collect_pipelined(self, toks, k: int, slotmap) -> None:
        """Distribute a fetched [k, B] window to the requests that were
        active WHEN IT WAS DISPATCHED (finish bookkeeping only — `pos` is
        advanced at dispatch time in the pipelined loop)."""
        for slot, rid in slotmap.items():
            req = self.requests.get(rid)
            if req is None or req.done:
                continue
            for i in range(k):
                tok = int(toks[i, slot])
                req.generated.append(tok)
                if self._slot_req.get(slot) == rid:
                    # pre-freed slots may already host a NEW request whose
                    # next_tok must not be clobbered by this late collect
                    self.next_tok[slot] = tok
                if (req.eos_id is not None and tok == req.eos_id) or len(
                    req.generated
                ) >= req.max_new_tokens:
                    self._finish(req)
                    break

    def _admissions_hook(self):
        """Admit queued requests into free slots; returns the slots newly
        claimed (their first token must come from the host at the next
        dispatch). The bench and servers enqueue with `submit`."""
        newly = []
        self._order_queue()
        while self.free and self._queue:
            batch = []
            while self.free and len(batch) < len(self.free) and self._queue:
                batch.append(self._queue.pop())
            if not batch:
                break
            before = set(self._slot_req)
            self.add_requests(batch)
            newly.extend(set(self._slot_req) - before)
        return newly

    def _order_queue(self) -> None:
        if self.schedule == "ljf" and len(self._queue) > 1:
            self._queue.sort(key=lambda r: r[1])  # pop() takes the longest

    def _admissions_async(self):
        """Admit queued requests WITHOUT any device sync: the prefill's
        argmax stays a device array, scattered into the next window's
        `tok0` on device and resolved into host bookkeeping at the next
        collect boundary (`_resolve_first_tokens`). This is what keeps the
        speculative pipeline's device queue busy — the synchronous
        `add_requests` fetches the first token immediately, which blocks
        on everything already queued (measured: ~41 ms/window of host
        stall, the whole pipelining win given back)."""
        jnp = self._jnp
        self._order_queue()
        while self.free and self._queue:
            batch = []
            while self.free and len(batch) < len(self.free) and self._queue:
                batch.append(self._queue.pop())
            if not batch:
                return
            for plen in (len(p) for p, _, _ in batch):
                if plen >= self.max_len:
                    raise ValueError(
                        f"prompt of {plen} tokens does not fit max_len="
                        f"{self.max_len}"
                    )
            # ONE prefill dispatch per admission round, at the LARGEST
            # bucket present: every dispatch reads the full weights
            # (~10.6 ms for 8B a8 — prefill at these lengths is weight-
            # read-bound, not compute-bound), and the batch is padded to
            # max_slots rows regardless, so merging buckets only adds
            # padded FLOPs on the shorter prompts — strictly cheaper
            # than one weight read per bucket.
            bucket = self._bucket(max(len(p) for p, _, _ in batch))
            npad = self.max_slots
            toks_np = np.zeros((npad, bucket), np.int32)
            last_np = np.zeros(npad, np.int64)
            for row, (prompt, _, _) in enumerate(batch):
                prompt = np.asarray(prompt, np.int32)
                toks_np[row, : len(prompt)] = prompt
                last_np[row] = len(prompt) - 1
            batch_cache = self._batch_cache(npad)
            logits, batch_cache = self._prefill(
                self.params, batch_cache, jnp.asarray(toks_np), jnp.int32(0)
            )
            nxts_dev = self._pick(
                logits[jnp.arange(npad), jnp.asarray(last_np), :]
            ).astype(jnp.int32)  # [npad] device, NOT fetched
            slotmap: Dict[int, Tuple[int, int]] = {}
            for row, (prompt, max_new, eos_id) in enumerate(batch):
                slot = self.free.pop()
                self._write_slot_cache(
                    slot,
                    {kk: v[:, row : row + 1] for kk, v in batch_cache.items()},
                )
                rid = self._next_rid
                self._next_rid += 1
                req = _Request(rid, slot, len(prompt), max_new, [],
                               eos_id, scheduled=1)
                self.requests[rid] = req
                self._slot_req[slot] = rid
                self.pos[slot] = len(prompt)
                slotmap[slot] = (row, rid)
            self._first_pending.append((nxts_dev, slotmap))
            self._scatter_next.append((nxts_dev, slotmap))

    def _resolve_first_tokens(self) -> None:
        """Fetch the pending prefill first-tokens (their prefills are
        behind the window we just synced, so this is a short wait) and
        fold them into request bookkeeping."""
        for nxts_dev, slotmap in self._first_pending:
            vals = np.asarray(nxts_dev)
            for slot, (row, rid) in slotmap.items():
                req = self.requests.get(rid)
                if req is None:
                    continue
                tok = int(vals[row])
                req.generated.append(tok)
                if self._slot_req.get(slot) == rid:
                    self.next_tok[slot] = tok
                if (req.eos_id is not None and tok == req.eos_id) or len(
                    req.generated
                ) >= req.max_new_tokens:
                    self._finish(req)
        self._first_pending = []

    def submit(self, prompt_tokens, max_new_tokens: int = 64, eos_id=None) -> None:
        """Queue a request for admission at the next free-slot window
        boundary (used with `run_pipelined`)."""
        self._queue.append((list(prompt_tokens), max_new_tokens, eos_id))

    def run(self, max_steps: int = 10_000, step_tokens: int = 1) -> None:
        steps = 0
        while self._slot_req and steps < max_steps:
            if step_tokens > 1:
                self.step_n(step_tokens)
            else:
                self.step()
            steps += 1

    def result(self, rid: int) -> List[int]:
        """Generated tokens for a request; finished requests are evicted on
        read so a long-running engine does not accumulate them forever."""
        req = self.requests[rid]
        if req.done:
            del self.requests[rid]
        return req.generated
