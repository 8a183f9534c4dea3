"""Persistent XLA compilation cache (cross-process compile reuse).

First compiles over the axon remote-compile tunnel cost 1-3+ minutes per
program PER PROCESS; kaldi-style recipes launch a fresh python per stage
(and per speaker), so a small synthetic run burned ~20 min purely on
recompiles. The JAX persistent cache works fine through the tunnel
(measured round 3: 0.3 s warm vs minutes cold for the same program), so
every CLI enables it by default.

Env control: ``S2S_JAX_CACHE_DIR`` overrides the location; set it EMPTY to
disable. Default: ``~/.cache/seq2seq_vc_tpu/xla``.

``S2S_JAX_PLATFORM`` (e.g. ``cpu``) forces the jax platform for every CLI
— needed because images that pre-import jax from sitecustomize pin
``JAX_PLATFORMS`` before user code runs, so the env var alone cannot
redirect a recipe stage to CPU; ``jax.config.update`` after import can.
"""

from __future__ import annotations

import logging
import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "seq2seq_vc_tpu", "xla"
)


def enable_compilation_cache() -> None:
    """Idempotently point jax at the on-disk compilation cache (and apply
    the ``S2S_JAX_PLATFORM`` override) — called first by every CLI."""
    plat = os.environ.get("S2S_JAX_PLATFORM")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception as e:  # pragma: no cover
            logging.warning("S2S_JAX_PLATFORM=%s not applied: %s", plat, e)
    path = os.environ.get("S2S_JAX_CACHE_DIR", _DEFAULT)
    if not path:
        return
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time; trivial
        # programs recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        logging.debug("compilation cache unavailable: %s", e)
