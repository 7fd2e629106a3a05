"""True multi-process data parallelism: two OS processes, one jax
coordinator, a global (2, 1) mesh with one CPU device per process — the
TPU-native analogue of the reference's DDP/NCCL path
(`/root/reference/trainers/train.py:216-221,1433-1437`), actually
exercising cross-process collectives rather than mocking the init hook."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", 2, proc_id)
sys.path.insert(0, @@REPO@@)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from multimodal_sequencing_tpu.models.config import (EncoderConfig,
                                                     MultimodalConfig)
from multimodal_sequencing_tpu.models.sequencer import SequencingModel
from multimodal_sequencing_tpu.parallel.mesh import make_mesh
from multimodal_sequencing_tpu.train.state import (make_train_state,
                                                   make_optimizer)
from multimodal_sequencing_tpu.train.steps import make_train_step
from __graft_entry__ import _synth_batch

enc = EncoderConfig.tiny(max_position_embeddings=96)
cfg = MultimodalConfig(encoder=enc, hierarchical_version="v1",
                       max_story_length=5, max_seq_length=64,
                       per_seq_max_length=12)
batch = _synth_batch(cfg, batch_size=4, seed=0)   # the GLOBAL batch
mesh = make_mesh()  # (2, 1) across both processes
state = make_train_state(
    SequencingModel(cfg), jax.random.PRNGKey(0),
    {k: v[:1] for k, v in batch.items()},
    tx=make_optimizer(learning_rate=1e-3, warmup_steps=2, total_steps=10))
repl = NamedSharding(mesh, P())
state = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x))
    if hasattr(x, "shape") else x, state)
data_sh = NamedSharding(mesh, P("data"))
local = {k: v[proc_id * 2:(proc_id + 1) * 2] for k, v in batch.items()}
gbatch = {k: jax.make_array_from_process_local_data(
    data_sh, v, (4,) + v.shape[1:]) for k, v in local.items()}
step = make_train_step(cfg, mesh)
state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
ck = float(jax.tree.reduce(
    lambda a, b: a + b,
    jax.tree.map(lambda x: jnp.abs(x.astype(jnp.float32)).sum(),
                 state.params)))
print(f"RESULT proc={proc_id} loss={float(metrics['loss']):.6f} "
      f"checksum={ck:.4f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace('@@REPO@@', repr(REPO)))
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=REPO, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = {}
    for out in outs:
        m = re.search(r"RESULT proc=(\d) loss=([\d.]+) checksum=([\d.]+)",
                      out)
        assert m, out[-2000:]
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    # both processes observe the same global loss and identical updated
    # params (the psum'd gradient step)
    assert results[0] == results[1]

    # and they match a single-process run on the same global batch
    import jax
    from multimodal_sequencing_tpu.models.config import (EncoderConfig,
                                                         MultimodalConfig)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodal_sequencing_tpu.train.state import (make_train_state,
                                                       make_optimizer)
    from multimodal_sequencing_tpu.train.steps import make_train_step
    from __graft_entry__ import _synth_batch

    enc = EncoderConfig.tiny(max_position_embeddings=96)
    cfg = MultimodalConfig(encoder=enc, hierarchical_version="v1",
                           max_story_length=5, max_seq_length=64,
                           per_seq_max_length=12)
    batch = _synth_batch(cfg, batch_size=4, seed=0)
    mesh = make_mesh(n_data=1)
    state = make_train_state(
        SequencingModel(cfg), jax.random.PRNGKey(0),
        {k: v[:1] for k, v in batch.items()},
        tx=make_optimizer(learning_rate=1e-3, warmup_steps=2,
                          total_steps=10))
    step = make_train_step(cfg, mesh)
    _, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    np.testing.assert_allclose(results[0][0], float(metrics["loss"]),
                               rtol=1e-4)
