"""LM request engines.

`BaseLM` re-implements the reference's batched request engine
(`/root/reference/models/models_utils.py:157-594` and
`lm_eval/base.py:120-369`): length-descending reordering, left truncation
to `max_length+1`, right padding, log-softmax + continuation gather +
greedy match, rolling windows for perplexity requests.

`JAXLM` is the concrete model (the `LMClass` equivalent,
`models/LMClass.py`): it scores padded batches with one jitted forward per
shape bucket — shapes are bucketed to powers of two so XLA compiles a
handful of programs instead of one per batch.
"""

from __future__ import annotations

import abc
from typing import Iterable, List, Optional, Tuple

import numpy as np

from .base import LM


class Reorderer:
    """Sort requests (by descending total length) and restore order
    (`models/models_utils.py:544-568`)."""

    def __init__(self, arr, fn):
        self.size = len(arr)
        self.arr = sorted(enumerate(arr), key=lambda x: fn(x[1]))

    def get_reordered(self):
        return [x for _, x in self.arr]

    def get_original(self, newarr):
        res = [None] * self.size
        for (i, _), v in zip(self.arr, newarr):
            res[i] = v
        return res


def get_rolling_token_windows(
    token_list: List[int], prefix_token: int, max_seq_len: int, context_len: int
) -> Iterable[Tuple[List[int], List[int]]]:
    """Rolling (context, prediction) windows over a long token stream
    (`models/models_utils.py:503-541`)."""
    if not token_list:
        return
    pred_len = max_seq_len - context_len + 1
    predicted = 0
    first_seq_len = min(max_seq_len, len(token_list))
    yield ([prefix_token] + token_list[: first_seq_len - 1], token_list[:first_seq_len])
    predicted += first_seq_len
    while predicted < len(token_list):
        window_pred_len = min(len(token_list) - predicted, pred_len)
        window_end = predicted + window_pred_len
        yield (
            token_list[window_end - max_seq_len - 1 : window_end - 1],
            token_list[window_end - window_pred_len : window_end],
        )
        predicted += window_pred_len


def make_disjoint_window(pair):
    """Trim context so windows are disjoint (`models/models_utils.py` use)."""
    a, b = pair
    return a[: len(a) - (len(b) - 1)] if len(b) > 1 else a, b


class BaseLM(LM):
    """Request engine; concrete subclasses provide tokenization +
    `_score_tokens`."""

    batch_size: int = 8
    max_length: int = 2048

    @property
    @abc.abstractmethod
    def eot_token_id(self) -> int: ...

    @abc.abstractmethod
    def tok_encode(self, string: str) -> List[int]: ...

    @abc.abstractmethod
    def tok_decode(self, tokens: List[int]) -> str: ...

    @abc.abstractmethod
    def _score_tokens(
        self, inps: np.ndarray, targets: np.ndarray, mask: np.ndarray
    ) -> tuple:
        """inps/targets/mask [B, S] right-padded; returns (ll_sums [B],
        greedy_ok [B]) — summed target logprobs and whether every masked
        target is the argmax. Device-side gather: only [B] scalars cross
        the host boundary (a [B, S, V] logprob transfer is ~8 GB/batch at
        Llama-3 vocab)."""

    @abc.abstractmethod
    def _model_generate(self, context: List[int], max_gen: int, stops: List[str]) -> str: ...

    # ------------------------------------------------------------------
    def loglikelihood(self, requests):
        new_reqs = []
        for context, continuation in requests:
            if context == "":
                context_enc = [self.eot_token_id]
            else:
                context_enc = self.tok_encode(context)
            continuation_enc = self.tok_encode(continuation)
            new_reqs.append(((context, continuation), context_enc, continuation_enc))
        return self._loglikelihood_tokens(new_reqs)

    def loglikelihood_rolling(self, requests):
        loglikelihoods = []
        for (string,) in [(r,) if isinstance(r, str) else r for r in requests]:
            windows = [
                make_disjoint_window(w)
                for w in get_rolling_token_windows(
                    self.tok_encode(string),
                    prefix_token=self.eot_token_id,
                    max_seq_len=self.max_length,
                    context_len=1,
                )
            ]
            windows = [(None, ctx, cont) for ctx, cont in windows]
            scores = self._loglikelihood_tokens(windows, disable_reorder=True)
            loglikelihoods.append(sum(s[0] for s in scores))
        return loglikelihoods

    max_gen_toks = 256

    def greedy_until(self, requests):
        res = []
        for context, until in requests:
            if isinstance(until, str):
                until = [until]
            # leave room for generation inside the position table (the
            # reference truncates to max_length - max_gen_toks,
            # `models/models_utils.py:434-472`); tiny test configs whose
            # max_length <= max_gen_toks keep at least half for context
            keep = max(self.max_length - self.max_gen_toks, self.max_length // 2)
            context_enc = self.tok_encode(context)[-keep:]
            out = self._model_generate(context_enc, self.max_gen_toks, until)
            for stop in until:
                out = out.split(stop)[0]
            res.append(out)
        return res

    # ------------------------------------------------------------------
    def _loglikelihood_tokens(self, requests, disable_reorder: bool = False):
        reord = Reorderer(
            requests, (lambda x: 0) if disable_reorder else (lambda x: -(len(x[1]) + len(x[2])))
        )
        ordered = reord.get_reordered() if not disable_reorder else requests
        results = []
        for start in range(0, len(ordered), self.batch_size):
            chunk = ordered[start : start + self.batch_size]
            seqs = [
                (list(context_enc) + list(continuation_enc))[-(self.max_length + 1) :]
                for _, context_enc, continuation_enc in chunk
            ]
            contlens = [len(c[2]) for c in chunk]
            maxlen = max(len(s) - 1 for s in seqs)
            b = len(chunk)
            inp = np.zeros((b, maxlen), dtype=np.int32)
            tgt = np.zeros((b, maxlen), dtype=np.int32)
            mask = np.zeros((b, maxlen), dtype=np.float32)
            for i, seq in enumerate(seqs):
                L = len(seq) - 1
                inp[i, :L] = seq[:-1]
                tgt[i, :L] = seq[1:]
                # left truncation can eat into a continuation longer than
                # the window; score whatever part survived
                cl = min(contlens[i], L)
                mask[i, L - cl : L] = 1.0
            lls, greedy_ok = self._score_tokens(inp, tgt, mask)
            for i in range(b):
                results.append((float(lls[i]), bool(greedy_ok[i])))
        return reord.get_original(results) if not disable_reorder else results


class JAXLM(BaseLM):
    """Concrete LM over the framework's functional models."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        rq=None,
        batch_size: int = 8,
        max_length: Optional[int] = None,
    ):
        import jax
        import jax.numpy as jnp
        from functools import partial

        from ...models.transformer import NO_QUANT, forward_logits

        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.rq = rq or NO_QUANT
        self.batch_size = batch_size
        self.max_length = max_length or min(cfg.max_position_embeddings, 2048)

        def _score(params, inps, targets, mask):
            logits = forward_logits(params, inps, cfg, self.rq).astype(jnp.float32)
            logz = jax.scipy.special.logsumexp(logits, axis=-1)
            tok_lp = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0] - logz
            lls = jnp.sum(tok_lp * mask, axis=-1)
            greedy = jnp.argmax(logits, axis=-1) == targets
            greedy_ok = jnp.all(jnp.where(mask > 0, greedy, True), axis=-1)
            return lls, greedy_ok

        self._score_jit = jax.jit(_score)
        self._gen_step = None

    @property
    def eot_token_id(self) -> int:
        return getattr(self.tokenizer, "eot_token_id", getattr(self.tokenizer, "bos_id", 0))

    def tok_encode(self, string: str) -> List[int]:
        # never add specials inside request scoring: a BOS spliced into a
        # continuation corrupts every loglikelihood (the reference encodes
        # with add_special_tokens=False, `models/LMClass.py:81-88`)
        try:
            ids = self.tokenizer.encode(string, add_special_tokens=False)
        except TypeError:  # tokenizers without the kwarg add none anyway
            ids = self.tokenizer.encode(string)
        return list(map(int, ids))

    def tok_decode(self, tokens) -> str:
        return self.tokenizer.decode(list(tokens))

    @staticmethod
    def _bucket(n: int) -> int:
        from ...eval.data import bucket_pow2

        return bucket_pow2(n)

    def _score_tokens(self, inps: np.ndarray, targets: np.ndarray, mask: np.ndarray):
        import jax.numpy as jnp

        b, s = inps.shape
        sb = min(self._bucket(s), self.max_length + 1)

        def pad(a, fill=0):
            out = np.full((b, sb), fill, dtype=a.dtype)
            out[:, :s] = a
            return out

        lls, greedy_ok = self._score_jit(
            self.params,
            jnp.asarray(pad(inps)),
            jnp.asarray(pad(targets)),
            jnp.asarray(pad(mask)),
        )
        return np.asarray(lls), np.asarray(greedy_ok)

    def _model_generate(self, context: List[int], max_gen: int, stops: List[str]) -> str:
        import jax.numpy as jnp

        from ...models.transformer import init_kv_cache

        if self._gen_step is None:
            import jax
            from functools import partial

            from ...models.transformer import decode_step

            # ONE jitted step reused for every request (a fresh jit wrapper
            # per call would defeat the compile cache); prompt lengths pad
            # to pow2 buckets so compiles are per bucket, not per length
            self._gen_step = jax.jit(partial(decode_step, cfg=self.cfg, rq=self.rq))
        step = self._gen_step
        n_ctx = len(context)
        ctx_b = self._bucket(n_ctx)
        total = self._bucket(ctx_b + max_gen)
        cache = init_kv_cache(self.cfg, 1, total)
        padded = np.zeros(ctx_b, dtype=np.int32)
        padded[:n_ctx] = np.asarray(context, dtype=np.int32)
        ctx = jnp.asarray(padded[None, :])
        logits, cache = step(self.params, cache, ctx, jnp.int32(0))
        out_tokens: List[int] = []
        nxt = int(np.asarray(jnp.argmax(logits[0, n_ctx - 1])))
        pos = n_ctx
        text = ""
        for _ in range(max_gen):
            out_tokens.append(nxt)
            text = self.tok_decode(out_tokens)
            if any(stop in text for stop in stops):
                break
            logits, cache = step(
                self.params, cache, jnp.asarray([[nxt]], jnp.int32), jnp.int32(pos)
            )
            nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
            pos += 1
        return text


class DummyLM(LM):
    """Deterministic fake LM for harness plumbing tests
    (`lm_eval/models/dummy.py:5-36`)."""

    def __init__(self, seed: int = 0):
        self.seed = seed

    def loglikelihood(self, requests):
        rng = np.random.default_rng(self.seed)
        return [(-float(rng.random()), False) for _ in requests]

    def loglikelihood_rolling(self, requests):
        rng = np.random.default_rng(self.seed)
        return [-float(rng.random()) for _ in requests]

    def greedy_until(self, requests):
        return ["lol" for _ in requests]


class Seq2SeqJAXLM(BaseLM):
    """T5-family request engine over the native encoder-decoder trunk
    (`models/seq2seq.py`): context tokens feed the ENCODER, continuations
    are scored by the teacher-forced DECODER — the reference's hf-seq2seq
    adapter semantics (`/root/reference/lm_eval/models/huggingface.py:
    422-586`, the T0-3B special case of `models/LMClass.py:35-39`), now
    reachable without torch."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        rq=None,
        batch_size: int = 8,
        max_length: Optional[int] = None,
    ):
        import jax
        import jax.numpy as jnp

        from ...models.seq2seq import decode_logits, encode, _pad_mask
        from ...models.transformer import NO_QUANT

        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.rq = rq or NO_QUANT
        self.batch_size = batch_size
        self.max_length = max_length or 512
        self._jnp = jnp

        def _score(params, enc, dec_in, targets, mask):
            enc_mask = _pad_mask(enc, cfg.pad_token_id)
            enc_h = encode(params, enc, cfg, self.rq, enc_mask)
            logits = decode_logits(
                params, dec_in, enc_h, cfg, self.rq, enc_mask
            ).astype(jnp.float32)
            logz = jax.scipy.special.logsumexp(logits, axis=-1)
            tok_lp = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0] - logz
            lls = jnp.sum(tok_lp * mask, axis=-1)
            greedy = jnp.argmax(logits, axis=-1) == targets
            greedy_ok = jnp.all(jnp.where(mask > 0, greedy, True), axis=-1)
            return lls, greedy_ok

        self._score_jit = jax.jit(_score)
        self._gen_jit = None

    @property
    def eot_token_id(self) -> int:
        return self.cfg.eos_token_id

    def tok_encode(self, string: str) -> List[int]:
        try:
            ids = self.tokenizer.encode(string, add_special_tokens=False)
        except TypeError:
            ids = self.tokenizer.encode(string)
        return list(map(int, ids))

    def tok_decode(self, tokens) -> str:
        return self.tokenizer.decode(list(tokens))

    @staticmethod
    def _bucket(n: int) -> int:
        from ...eval.data import bucket_pow2

        return bucket_pow2(max(n, 1))

    def _score_tokens(self, inps, targets, mask):  # pragma: no cover
        raise NotImplementedError("seq2seq scores (enc, dec) pairs")

    def _loglikelihood_tokens(self, requests, disable_reorder: bool = False):
        """Seq2seq batching: the causal concat of the base engine does not
        apply — encoder takes the context, decoder input is the start-
        shifted continuation, every continuation token is scored."""
        import numpy as np

        jnp = self._jnp
        reord = Reorderer(
            requests,
            (lambda x: 0) if disable_reorder else (lambda x: -(len(x[1]) + len(x[2]))),
        )
        ordered = reord.get_reordered() if not disable_reorder else requests
        results = []
        start_id = self.cfg.decoder_start_token_id
        pad_id = self.cfg.pad_token_id
        for s0 in range(0, len(ordered), self.batch_size):
            chunk = ordered[s0 : s0 + self.batch_size]
            b = len(chunk)
            encs = [list(c[1])[-self.max_length:] for c in chunk]
            conts = [list(c[2])[: self.max_length] for c in chunk]
            el = self._bucket(max(len(e) for e in encs))
            dl = self._bucket(max(len(c) for c in conts))
            enc = np.full((b, el), pad_id, np.int32)
            dec = np.full((b, dl), pad_id, np.int32)
            tgt = np.zeros((b, dl), np.int32)
            msk = np.zeros((b, dl), np.float32)
            for i, (e, c) in enumerate(zip(encs, conts)):
                enc[i, : len(e)] = e
                dec[i, 0] = start_id
                dec[i, 1 : len(c)] = c[:-1]
                tgt[i, : len(c)] = c
                msk[i, : len(c)] = 1.0
            lls, ok = self._score_jit(
                self.params, jnp.asarray(enc), jnp.asarray(dec),
                jnp.asarray(tgt), jnp.asarray(msk),
            )
            lls, ok = np.asarray(lls), np.asarray(ok)
            results.extend((float(lls[i]), bool(ok[i])) for i in range(b))
        return reord.get_original(results) if not disable_reorder else results

    def _model_generate(self, context: List[int], max_gen: int, stops: List[str]) -> str:
        import jax
        import numpy as np
        from functools import partial

        jnp = self._jnp
        if self._gen_jit is None:
            from ...models.seq2seq import greedy_generate_seq2seq_cached

            # KV-cached incremental decoder: O(T) per generation vs the
            # O(T^2) re-forward fallback (greedy streams identical, tested)
            self._gen_jit = jax.jit(
                partial(greedy_generate_seq2seq_cached, cfg=self.cfg, rq=self.rq),
                static_argnames=("n_steps",),
            )
        el = self._bucket(len(context))
        enc = np.full((1, el), self.cfg.pad_token_id, np.int32)
        enc[0, : len(context)] = context[-el:]
        toks = np.asarray(
            self._gen_jit(self.params, jnp.asarray(enc), n_steps=min(max_gen, 64))
        )[0]
        out = []
        for t in toks:
            if int(t) == self.cfg.eos_token_id:
                break
            out.append(int(t))
        text = self.tok_decode(out)
        for stop in stops:
            text = text.split(stop)[0]
        return text
