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
        self._order = [i for i, _ in self.arr]

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
    `_model_logprobs`."""

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
    def _model_logprobs(self, inps: np.ndarray, lengths: np.ndarray) -> tuple:
        """inps [B, S] right-padded int tokens; returns (logprobs [B, S, V]
        as np or device array supporting numpy indexing, greedy_tokens
        [B, S])."""

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

    def greedy_until(self, requests):
        res = []
        for context, until in requests:
            if isinstance(until, str):
                until = [until]
            context_enc = self.tok_encode(context)[-self.max_length :]
            out = self._model_generate(context_enc, 256, until)
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
            inps, inplens, contlens, conts = [], [], [], []
            for _, context_enc, continuation_enc in chunk:
                seq = (context_enc + continuation_enc)[-(self.max_length + 1) :]
                inp = seq[:-1]
                inps.append(inp)
                inplens.append(len(inp))
                contlens.append(len(continuation_enc))
                conts.append(continuation_enc)
            maxlen = max(inplens)
            batch = np.zeros((len(chunk), maxlen), dtype=np.int32)
            for i, inp in enumerate(inps):
                batch[i, : len(inp)] = inp
            logprobs, greedy = self._model_logprobs(batch, np.asarray(inplens))
            for i in range(len(chunk)):
                inplen, contlen = inplens[i], contlens[i]
                positions = np.arange(inplen - contlen, inplen)
                toks = np.asarray(conts[i])
                ll = float(np.sum(np.asarray(logprobs[i])[positions, toks]))
                is_greedy = bool(np.all(np.asarray(greedy[i])[positions] == toks))
                results.append((ll, is_greedy))
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
        from functools import partial

        from ...models.transformer import NO_QUANT, forward_logits

        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.rq = rq or NO_QUANT
        self.batch_size = batch_size
        self.max_length = max_length or min(cfg.max_position_embeddings, 2048)
        self._fwd = jax.jit(partial(forward_logits, cfg=cfg, rq=self.rq))

    @property
    def eot_token_id(self) -> int:
        return getattr(self.tokenizer, "eot_token_id", getattr(self.tokenizer, "bos_id", 0))

    def tok_encode(self, string: str) -> List[int]:
        return list(map(int, self.tokenizer.encode(string)))

    def tok_decode(self, tokens) -> str:
        return self.tokenizer.decode(list(tokens))

    @staticmethod
    def _bucket(n: int) -> int:
        b = 32
        while b < n:
            b *= 2
        return b

    def _model_logprobs(self, inps: np.ndarray, lengths: np.ndarray):
        import jax.numpy as jnp
        import jax

        b, s = inps.shape
        sb = min(self._bucket(s), self.max_length + 1)
        padded = np.zeros((b, sb), dtype=np.int32)
        padded[:, :s] = inps
        logits = self._fwd(self.params, jnp.asarray(padded)).astype(jnp.float32)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        greedy = jnp.argmax(logits, axis=-1)
        return np.asarray(logprobs[:, :s]), np.asarray(greedy[:, :s])

    def _model_generate(self, context: List[int], max_gen: int, stops: List[str]) -> str:
        import jax
        import jax.numpy as jnp
        from functools import partial

        from ...models.transformer import decode_step, init_kv_cache

        total = self._bucket(len(context) + max_gen)
        cache = init_kv_cache(self.cfg, 1, total)
        step = jax.jit(partial(decode_step, cfg=self.cfg, rq=self.rq))
        ctx = jnp.asarray(np.asarray(context, dtype=np.int32)[None, :])
        logits, cache = step(self.params, cache, ctx, jnp.int32(0))
        out_tokens: List[int] = []
        nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
        pos = len(context)
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
