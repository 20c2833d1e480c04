"""Multi-process (DCN-axis) smoke test.

Runs `tools/dcn_smoke.py`: two OS processes wired through
`jax.distributed.initialize` + Gloo on localhost CPU, one hybrid pod mesh
(dp over processes, tp over local devices), a sharded quantized forward
and one sharded LWC calibration step. This is the only leg of the
parallel stack that actually crosses a process boundary (everything else
runs on the single-process virtual mesh), mirroring how a TPU pod run
would execute `parallel/distributed.py` — the reference has no
distributed runtime at all (SURVEY.md §2.7).

Opt-out via L3Q_SKIP_DCN_SMOKE=1 (spawns subprocesses; ~1 min).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.skipif(
    os.environ.get("L3Q_SKIP_DCN_SMOKE") == "1", reason="opted out"
)
def test_two_process_pod_mesh_forward_and_calibration():
    import dcn_smoke

    out = dcn_smoke.launch(timeout=540.0)
    assert out.count(dcn_smoke.OK_MARKER) == dcn_smoke.NPROCS
