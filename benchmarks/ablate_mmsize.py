"""Raw in-kernel matmul throughput vs shape on v5e.

Times R repetitions of independent matmuls inside one Pallas kernel to
measure the effective MXU rate at the attention shapes vs trunk shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ablate_mmsize.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16
    rs = np.random.RandomState(0)

    def probe(M, K, N, reps, out_f32=True):
        a = jnp.asarray(rs.randn(M, K) * 0.1, dt)
        b = jnp.asarray(rs.randn(K, N) * 0.1, dt)

        def kern(a_ref, b_ref, o_ref):
            one = jnp.asarray(1e-3, dt)

            def body(i, carry):
                x, acc = carry
                y = jnp.dot(x, b_ref[:], preferred_element_type=jnp.float32)
                # cheap VPU perturbation defeats CSE without serializing
                # the matmuls behind anything expensive
                return x + one, acc + y

            _, acc = jax.lax.fori_loop(
                0, reps, body,
                (a_ref[:], jnp.zeros((M, N), jnp.float32)))
            o_ref[:] = acc.astype(dt)

        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), dt),
            in_specs=[pl.BlockSpec((M, K), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, N), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, N), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        jf = jax.jit(lambda a, b: call(a, b))
        out = jf(a, b)
        np.asarray(out[:1, :1])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(a, b)
        np.asarray(out[:1, :1])
        t = (time.perf_counter() - t0) / iters
        fl = 2 * M * K * N * reps
        print(f"  ({M:5d},{K:4d})@({K:4d},{N:5d}) x{reps:4d}: "
              f"{t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s", flush=True)

    print("matmul-rate probes (bf16 in, f32 acc):")
    probe(592, 64, 592, 256)      # per-head scores shape
    probe(592, 592, 64, 256)      # per-head o shape
    probe(592, 128, 1232, 128)    # pair block-diag scores
    probe(592, 1232, 128, 128)    # pair block-diag o
    probe(592, 256, 2464, 64)     # quad block-diag scores
    probe(592, 768, 592, 64)      # single big score-like
    probe(592, 768, 3072, 32)     # fc1 shape
    probe(592, 3072, 768, 32)     # fc2 shape
    probe(128, 128, 128, 1024)    # minimal MXU tile
    probe(256, 256, 256, 512)


if __name__ == "__main__":
    main()
