"""Reproduce / verify TP x SP composition gradients (CPU fake mesh).

Round-3 note: combining tensor_parallel>1 with sequence_parallel>1 was
rejected because conv kernel grads appeared over-reduced by the idle model
axis. This script measures exactly which gradient leaves diverge between:
  (a) unsharded single-device step
  (b) SP-only  (data=2, model=1, seq=2)
  (c) TP-only  (data=2, model=2, seq=1) with Megatron param shardings
  (d) TP + SP  (data=2, model=2, seq=2) with both

Run: JAX_PLATFORMS=cpu python scripts/repro_tp_sp.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from seq2seq_vc_tpu.models import AASVC
from seq2seq_vc_tpu.parallel import get_mesh
from seq2seq_vc_tpu.parallel.tp import shard_params, tp_param_specs


def model_for(sp_mesh=None):
    return AASVC(
        idim=20, odim=20, adim=32, aheads=4, elayers=2, dlayers=2,
        eunits=64, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_type="deterministic",
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        encoder_normalize_before=True, decoder_normalize_before=True,
        sp_mesh=sp_mesh,
    )


def batch():
    rng = np.random.default_rng(0)
    B, T = 2, 16
    xs = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, 2 * T, 20)), jnp.float32)
    return xs, jnp.asarray([16, 12]), ys, jnp.asarray([32, 24])


def loss_and_grads(model, params, b, donate=False):
    xs, ilens, ys, olens = b

    def loss_fn(p):
        out = model.apply(
            p, xs, ilens, ys, olens, deterministic=True,
            rngs={"noise": jax.random.PRNGKey(3)},
        )
        return jnp.mean((out["after_outs"] - ys) ** 2) + out["bin_loss"]

    return jax.jit(jax.value_and_grad(loss_fn))(params)


def compare(tag, ref_grads, got_grads, atol=1e-5, rtol=1e-4):
    bad = []
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_got = jax.tree_util.tree_leaves(got_grads)
    for (path, a), g in zip(flat_ref, flat_got):
        a = np.asarray(a)
        g = np.asarray(g)
        err = np.max(np.abs(a - g) / (np.abs(a) * rtol + atol))
        if err > 1.0:
            name = "/".join(
                p.key if hasattr(p, "key") else str(p) for p in path
            )
            ratio = np.median(g[a != 0] / a[a != 0]) if (a != 0).any() else float("nan")
            bad.append((name, float(err), float(ratio)))
    print(f"--- {tag}: {len(bad)} bad leaves")
    for name, err, ratio in bad[:20]:
        print(f"    {name}: err={err:.1f} median(got/ref)={ratio:.4f}")
    return bad


def main():
    b = batch()
    xs, ilens, ys, olens = b
    ref_model = model_for()
    keys = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "noise": jax.random.PRNGKey(2),
    }
    params = jax.jit(
        lambda: ref_model.init(keys, xs, ilens, ys, olens, deterministic=True)
    )()
    ref_loss, ref_grads = loss_and_grads(ref_model, params, b)
    print("ref loss", float(ref_loss))

    # (b) SP only
    mesh = get_mesh(data=2, model=1, seq=2, devices=jax.devices()[:4])
    sp_loss, sp_grads = loss_and_grads(model_for(sp_mesh=mesh), params, b)
    print("sp-only loss", float(sp_loss))
    compare("SP only", ref_grads, sp_grads)

    # (c) TP only (params sharded over model)
    mesh = get_mesh(data=2, model=2, seq=1, devices=jax.devices()[:4])
    p_tp = shard_params(params, mesh)
    tp_loss, tp_grads = loss_and_grads(model_for(), p_tp, b)
    print("tp-only loss", float(tp_loss))
    compare("TP only", ref_grads, tp_grads)

    # (d) TP + SP
    mesh = get_mesh(data=2, model=2, seq=2, devices=jax.devices()[:8])
    p_tp = shard_params(params, mesh)
    both_loss, both_grads = loss_and_grads(model_for(sp_mesh=mesh), p_tp, b)
    print("tp+sp loss", float(both_loss))
    compare("TP + SP", ref_grads, both_grads)

    # (e) SP with an IDLE model axis (params replicated) — the reported bug
    mesh = get_mesh(data=2, model=2, seq=2, devices=jax.devices()[:8])
    idle_loss, idle_grads = loss_and_grads(model_for(sp_mesh=mesh), params, b)
    print("idle-model+sp loss", float(idle_loss))
    compare("idle model + SP", ref_grads, idle_grads)


if __name__ == "__main__":
    main()
