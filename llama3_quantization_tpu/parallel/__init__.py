"""GSPMD distribution: device mesh, param shardings, sharded execution.

The reference's only "distribution" is single-process multi-GPU layer
placement with hook-based activation shipping
(`/root/reference/parallel_utils.py`, SURVEY.md §2.7). The TPU-native
replacement is first-class SPMD: one `jax.sharding.Mesh` with `dp`/`tp`
axes, parameter PartitionSpecs (packed quantized weights tensor-sharded on
the feature axis, scales sharded congruently), and jitted programs in which
XLA inserts the all-reduces.
"""

from .calibrate import (  # noqa: F401
    sharded_gptq_quantize_weight,
    sharded_hessian_update,
)
from .collective_matmul import ag_matmul, rs_matmul  # noqa: F401
from .mesh import make_mesh  # noqa: F401
from .pipeline import (  # noqa: F401
    make_pipeline_forward,
    pipeline_pspecs,
    shard_params_pipeline,
)
from .ring_attention import make_sp_forward, ring_attention  # noqa: F401
from .tp_overlap import make_tp_overlap_forward, tp_overlap_pspecs  # noqa: F401
from .sharding import (  # noqa: F401
    make_sharded_forward,
    model_pspecs,
    seq2seq_pspecs,
    shard_params,
    shard_params_seq2seq,
)
