"""Worker process for tests/test_distributed_multiprocess.py.

Runs as one of two cooperating processes: initializes the jax distributed
runtime through ``parallel.distributed.initialize_multihost`` (the
framework's replacement for the reference's launcher + NCCL rendezvous,
reference ``distributed/launch.py:245-299``), builds the global data mesh,
assembles its HALF of a global batch via ``parallel.mesh.shard_batch``'s
multi-host path (``jax.make_array_from_process_local_data``), and runs one
deterministic DP AAS-VC loss + grad step. Prints ``LOSS <float>`` for the
parent to compare across processes and against the single-process value.
"""

import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    import numpy as np
    import jax

    from seq2seq_vc_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", 2, pid)
    if jax.process_count() != 2:
        print("DIST-INIT-FAILED", flush=True)
        return

    import jax.numpy as jnp

    from seq2seq_vc_tpu.parallel.mesh import (
        get_mesh,
        is_coordinator,
        replicated_sharding,
        shard_batch,
    )

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_batch, _flagship

    model = _flagship(adim=32, elayers=1)
    B, T = 4, 16
    src, slens, tgt, tlens = _example_batch(B, T, T)

    def _init(s, sl, t, tl, seed):
        keys = {
            "params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "noise": jax.random.PRNGKey(seed + 2),
        }
        return model.init(keys, s, sl, t, tl, deterministic=True)

    # identical init in both processes (same seed, same op order), then
    # assembled into one replicated global array per leaf
    params = jax.jit(_init)(src[:1], slens[:1], tgt[:1], tlens[:1], 0)
    mesh = get_mesh()
    assert dict(mesh.shape)["data"] == 2, mesh.shape
    repl = replicated_sharding(mesh)
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        params,
    )

    # each process holds only ITS rows of the global batch
    lo, hi = 2 * pid, 2 * pid + 2
    local = {
        "src": src[lo:hi], "slens": slens[lo:hi],
        "tgt": tgt[lo:hi], "tlens": tlens[lo:hi],
    }
    gb = shard_batch(local, mesh)

    @jax.jit
    def step(p, s, sl, t, tl):
        def loss_fn(p):
            out = model.apply(
                p, s, sl, t, tl, deterministic=True,
                rngs={"noise": jax.random.PRNGKey(7)},
            )
            return (
                jnp.mean(jnp.abs(out["after_outs"] - out["ys"]))
                + out["bin_loss"]
            )

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p = jax.tree_util.tree_map(lambda a, g: a - 1e-3 * g, p, grads)
        return loss, p

    loss, params = step(params, gb["src"], gb["slens"], gb["tgt"], gb["tlens"])
    loss = float(np.asarray(loss))
    print(f"COORD {int(is_coordinator())}", flush=True)
    print(f"LOSS {loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
