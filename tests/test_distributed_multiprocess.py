"""True multi-process ``jax.distributed`` smoke test (VERDICT r3 #4).

Every other multi-device check in this suite is a single-process fake mesh;
this one spawns TWO real processes that rendezvous through
``initialize_multihost`` (localhost coordinator), assemble a global batch
with ``jax.make_array_from_process_local_data``, and run one deterministic
DP AAS-VC loss+grad step. The losses must agree across processes and match
the single-process value on the same global batch — covering the
reference's tested-in-anger surface (``distributed/launch.py:245-299``) at
the jax.distributed level. Skips (with the reason) if the runtime refuses
multi-process init on this host.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",  # never dial the axon relay
        "XLA_FLAGS": "",  # 1 local device per process -> 2 global
        "PYTHONPATH": REPO,
    })
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_distributed_worker.py"),
             str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        if "DIST-INIT-FAILED" in out:
            pytest.skip(
                "jax.distributed refused 2-process init on this host: "
                + out.strip().splitlines()[-1]
            )
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"

    losses = []
    coords = []
    for rc, out, err in outs:
        lines = dict(
            l.split(" ", 1) for l in out.strip().splitlines() if " " in l
        )
        assert "LOSS" in lines, out
        losses.append(float(lines["LOSS"]))
        coords.append(int(lines["COORD"]))
    # both processes computed the same global loss; exactly one coordinator
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    assert sorted(coords) == [0, 1], coords

    # single-process reference on the same global batch
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from __graft_entry__ import _example_batch, _flagship

    model = _flagship(adim=32, elayers=1)
    src, slens, tgt, tlens = _example_batch(4, 16, 16)

    def _init(s, sl, t, tl, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }
        return model.init(keys, s, sl, t, tl, deterministic=True)

    params = jax.jit(_init)(src[:1], slens[:1], tgt[:1], tlens[:1], 0)

    @jax.jit
    def loss_fn(p, s, sl, t, tl):
        out = model.apply(
            p, s, sl, t, tl, deterministic=True,
            rngs={"noise": jax.random.PRNGKey(7)},
        )
        return jnp.mean(jnp.abs(out["after_outs"] - out["ys"])) + out["bin_loss"]

    ref = float(np.asarray(loss_fn(params, src, slens, tgt, tlens)))
    assert abs(losses[0] - ref) < 1e-5 * max(1.0, abs(ref)), (losses[0], ref)
