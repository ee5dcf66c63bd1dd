#!/usr/bin/env python
"""Probe which narrow dtypes this toolchain's Mosaic compiler can lower in a
Pallas VPU kernel (static slice + max — the exact op mix the quantized
RoIPool table path needs).

Round-2 finding: the container's remote tpu_compile_helper crashes (HTTP 500)
on ANY int8 VPU op. int8 tables would cut the pool kernel's vector bytes 2x
(the remaining ~25-30% lever to 5x+). This probes int8 / fp8_e4m3 / fp8_e5m2
/ uint8 so the kernel can auto-select a working narrow dtype per toolchain.
"""


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(dtype) -> str:
    def kernel(x_ref, o_ref):
        a = x_ref[0:8, :]
        b = x_ref[8:16, :]
        o_ref[...] = jnp.maximum(a, b)

    x = jnp.arange(16 * 512, dtype=jnp.float32).reshape(16, 512)
    x = (x / x.size).astype(dtype)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 512), dtype),
        )(x)
        expect = jnp.maximum(x[0:8], x[8:16])
        ok = bool(jnp.all(out == expect))
        return "OK" if ok else "WRONG-RESULT"
    except Exception as e:  # compile or runtime failure
        return f"FAIL ({type(e).__name__}: {str(e)[:120]})"


def main():
    for dt in (jnp.bfloat16, jnp.int8, jnp.uint8,
               jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int4):
        name = jnp.dtype(dt).name
        print(f"{name:16s} {probe(dt)}", flush=True)


if __name__ == "__main__":
    main()
