"""End-of-suite canary for mapping exhaustion (runs LAST: zzz prefix).

XLA:CPU JIT-links each compiled executable into dedicated anonymous
mappings that persist as long as the jit caches hold the executable.  A
full-suite process was measured crossing the kernel's default
``vm.max_map_count`` (65,530) after ~186 tests and SEGFAULTING inside
whatever native code called mmap next (three observed flavors: executable
serialization during a persistent-cache write, XLA compilation itself).
``tests/conftest.py::_bound_jit_maps`` clears the jax caches whenever the
count crosses 30k; this test (a) asserts the guard kept the process under
the ceiling and (b) performs one final FRESH compile — a unique scan
length per process, so the persistent cache can never serve it — which is
exactly the operation that segfaulted before the guard existed.
"""
import os

import jax
import jax.numpy as jnp


def test_process_mappings_bounded_and_fresh_compile_survives():
    try:
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:
        n_maps = 0  # non-Linux: no map accounting; the compile probe still runs
    assert n_maps < 60_000, (
        f"{n_maps} memory mappings near the vm.max_map_count ceiling "
        "(65,530) — the conftest _bound_jit_maps guard is not holding"
    )

    # Unique-per-process scan length => guaranteed cache-miss compile.
    n = 137 + (int.from_bytes(os.urandom(2), "little") % 4001)

    def f(x):
        def body(c, _):
            inner = jax.lax.scan(
                lambda a, b: (a * 1.0001 + b, a), c, jnp.arange(7.0)
            )[0]
            return inner, c

        return jax.lax.scan(body, x, None, length=n)[0]

    assert jnp.isfinite(jax.jit(f)(jnp.float32(1.0)))
