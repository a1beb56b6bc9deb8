"""Multi-host bring-up: 2 local processes via jax.distributed (CPU backend).

The reference's only parallelism is one shared-memory thread pool
(src/renderer.cpp:98-151); the multi-host analog here is
jax.distributed.initialize + a global (tiles, spp) mesh spanning both
processes' devices. This test spawns 2 REAL processes that each hold 4
virtual CPU devices, builds the 8-device global mesh, runs render_sharded
AND one inverse-rendering train step across them, and checks both
processes agree with a single-process run of the same configuration.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
out_path = sys.argv[3]

sys.path.insert(0, {repo!r})
from plutracer_tpu.parallel.mesh import initialize_distributed, make_mesh
from plutracer_tpu.parallel.sharded import render_sharded, make_train_step, get_params

initialize_distributed(
    coordinator="127.0.0.1:9371",
    num_processes=num_procs,
    process_id=proc_id,
)
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # global devices

import numpy as np
from plutracer_tpu.scene import compile_scene, load_scene_file

desc = load_scene_file("/root/reference/scenes/minimal0.urn", ["/res", "16x16"])
scene = compile_scene(desc)
mesh = make_mesh((4, 2))
key = np.asarray(jax.random.PRNGKey(7))  # host-local (uncommitted) input

img = np.asarray(render_sharded(scene, 16, 16, 2, key, mesh))

# host-local params/target: every process passes the same bytes, jit
# assembles the replicated/sharded global arrays locally
params = jax.tree.map(np.asarray, get_params(scene))
step = make_train_step(scene, 16, 16, 1, mesh)
opt_state = step.init(params)
target = np.zeros((16 * 16, 3), np.float32)
params2, opt_state, loss = step(params, opt_state, target, key, np.int32(0))
def to_host(x):
    # params/loss are replicated (P() specs + psum'd grads): every process
    # holds a full copy in its local shard
    try:
        return np.asarray(x)
    except RuntimeError:
        return np.asarray(x.addressable_shards[0].data)

mat_color = to_host(params2["mat_color"])
loss = float(to_host(loss))

np.savez(out_path, img=img, loss=loss, mat_color=mat_color)
print("WORKER_OK", proc_id)
"""


@pytest.mark.skipif(
    os.environ.get("PLUTRACER_NO_MULTIHOST") == "1",
    reason="multi-host test disabled",
)
def test_two_process_distributed(tmp_path):
    script = WORKER.format(repo=str(REPO))
    outs = [tmp_path / f"out{i}.npz" for i in range(2)]
    procs = []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for i in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script, str(i), "2", str(outs[i])],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
                cwd=str(tmp_path),
            )
        )
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
        assert "WORKER_OK" in logs[i]

    z0, z1 = np.load(outs[0]), np.load(outs[1])
    # both processes see the same global render and the same training step
    np.testing.assert_allclose(z0["img"], z1["img"], rtol=0, atol=0)
    assert z0["loss"] == z1["loss"]
    np.testing.assert_array_equal(z0["mat_color"], z1["mat_color"])

    # cross-check against a single-process 8-device run of the same config
    single = subprocess.run(
        [
            sys.executable,
            "-c",
            SINGLE.format(repo=str(REPO)),
            str(tmp_path / "single.npz"),
        ],
        capture_output=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert single.returncode == 0, single.stdout.decode() + single.stderr.decode()
    zs = np.load(tmp_path / "single.npz")
    np.testing.assert_allclose(z0["img"], zs["img"], rtol=1e-5, atol=1e-5)


SINGLE = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from plutracer_tpu.parallel.mesh import make_mesh
from plutracer_tpu.parallel.sharded import render_sharded
from plutracer_tpu.scene import compile_scene, load_scene_file
desc = load_scene_file("/root/reference/scenes/minimal0.urn", ["/res", "16x16"])
scene = compile_scene(desc)
mesh = make_mesh((4, 2))
img = np.asarray(render_sharded(scene, 16, 16, 2, jax.random.PRNGKey(7), mesh))
np.savez(sys.argv[1], img=img)
"""
