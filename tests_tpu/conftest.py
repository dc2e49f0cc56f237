"""On-chip (compiled-Mosaic) kernel validation tier.

The main suite (tests/) pins JAX to a virtual 8-device CPU mesh, so the
Pallas kernels there run in INTERPRET mode — semantics, not compilation.
This tier runs the same equality assertions against the REAL compiled
kernels on the TPU behind the tunnel:

    python -m pytest tests_tpu/ -q          # ~3-5 min incl. compiles

It formalizes the scratch-script on-chip equality checks from rounds 1-3
(docs/PERF.md validation sections) so future kernel changes re-prove
compiled behavior with one command. Skips itself cleanly when no TPU
backend is reachable (e.g. tunnel down).
"""
import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU backend (tunnel down or CPU-only env)")
        for item in items:
            item.add_marker(skip)
