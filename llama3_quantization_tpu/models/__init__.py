"""Model zoo: functional decoder-only transformers + param transforms."""

from .configs import (  # noqa: F401
    LLAMA2_7B,
    LLAMA3_8B,
    LLAMA3_70B,
    NAMED_CONFIGS,
    OPT_125M,
    TINY_LLAMA,
    TINY_OPT,
    ModelConfig,
)
from .params import init_params, quantize_model_rtn, linear_names  # noqa: F401
from .transformer import (  # noqa: F401
    NO_QUANT,
    RuntimeQuantConfig,
    decode_step,
    forward_hidden,
    forward_logits,
    greedy_generate,
    sample_generate,
    speculative_generate,
    flatten_speculative,
    sample_logits,
    set_decode_kernel,
    set_decode_mesh,
    set_moe_capacity,
    init_kv_cache,
)

from .seq2seq import (  # noqa: E402,F401  (native T5/T0 trunk, round 4)
    Seq2SeqConfig,
    decode_step_seq2seq,
    forward_logits_seq2seq,
    from_hf_seq2seq,
    greedy_generate_seq2seq,
    greedy_generate_seq2seq_cached,
    init_seq2seq_state,
    quantize_seq2seq_rtn,
)
