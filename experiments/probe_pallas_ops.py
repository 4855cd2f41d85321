"""Probe Mosaic support + cost for the act-rollout kernel's building blocks.

Checks, on the real chip, that the ops the fused act-rollout kernel needs
lower correctly inside a Pallas TPU kernel:
  1. lax.dot_general with lhs contraction over dim 0 ([47,128]^T @ [47,64])
  2. 2D jnp.transpose of a [10,128] tile (hand columns)
  3. argmax over lanes of a [128,104] tile
  4. reshape [1024] -> [8,128]
Each probe validates against the XLA equivalent.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kernel, outs, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=outs,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=jax.tree.map(
                lambda _: pl.BlockSpec(memory_space=pltpu.VMEM), outs,
                is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
            ),
        )
        got = jax.jit(fn)(*args)
        print(f"  {name}: OK")
        return got
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAIL -> {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.normal(size=(47, 128)), jnp.float32)   # feat-major obs
    W1 = jnp.asarray(rng.normal(size=(47, 64)), jnp.float32)
    H = jnp.asarray(rng.normal(size=(128, 104)), jnp.float32)
    hands = jnp.asarray(rng.integers(0, 104, size=(16, 128)), jnp.int32)
    flat = jnp.asarray(rng.integers(0, 104, size=(1024,)), jnp.int32)

    # 1. lhs-transposed dot_general
    def k1(c_ref, w_ref, o_ref):
        o_ref[:] = lax.dot_general(
            c_ref[:], w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    got = probe("dotT [47,128]x[47,64]", k1,
                jax.ShapeDtypeStruct((128, 64), jnp.float32), C, W1)
    if got is not None:
        want = C.T @ W1
        print(f"     max|diff| vs XLA: {float(jnp.max(jnp.abs(got - want))):.3e}")

    # 2. 2D transpose of int tile
    def k2(h_ref, o_ref):
        o_ref[:] = h_ref[:].T

    got = probe("transpose [16,128]->[128,16]", k2,
                jax.ShapeDtypeStruct((128, 16), jnp.int32), hands)
    if got is not None:
        print(f"     exact: {bool(jnp.all(got == hands.T))}")

    # 3. argmax over lanes
    def k3(h_ref, o_ref):
        o_ref[:] = jnp.argmax(h_ref[:], axis=1)[:, None].astype(jnp.int32)

    got = probe("argmax [128,104] lanes", k3,
                jax.ShapeDtypeStruct((128, 1), jnp.int32), H)
    if got is not None:
        want = jnp.argmax(H, axis=1).astype(jnp.int32)
        print(f"     exact: {bool(jnp.all(got[:, 0] == want))}")

    # 4. reshape [1024] -> [8,128]
    def k4(f_ref, o_ref):
        o_ref[:] = f_ref[:].reshape(8, 128)

    got = probe("reshape [1024]->[8,128]", k4,
                jax.ShapeDtypeStruct((8, 128), jnp.int32), flat)
    if got is not None:
        print(f"     exact: {bool(jnp.all(got == flat.reshape(8, 128)))}")

    # 5. 3D transpose (feat-major stack -> rows) -- stretch goal
    S = jnp.asarray(rng.normal(size=(47, 8, 128)), jnp.float32)

    def k5(s_ref, o_ref):
        o_ref[:] = jnp.transpose(s_ref[:], (1, 2, 0)).reshape(1024, 47)

    got = probe("transpose3d [47,8,128]->[1024,47]", k5,
                jax.ShapeDtypeStruct((1024, 47), jnp.float32), S)
    if got is not None:
        want = jnp.transpose(S, (1, 2, 0)).reshape(1024, 47)
        print(f"     exact: {bool(jnp.all(got == want))}")


if __name__ == "__main__":
    main()


def main2():
    rng = np.random.default_rng(1)
    S = jnp.asarray(rng.normal(size=(47, 8, 128)), jnp.float32)
    W1 = jnp.asarray(rng.normal(size=(47, 64)), jnp.float32)
    Wa = jnp.asarray(rng.normal(size=(64, 104)), jnp.float32)
    hand = jnp.asarray(rng.integers(0, 104, size=(8, 128)), jnp.int32)

    # 6. 3D dot_general contraction over dim 0: [47,8,128] x [47,64] -> [8,128,64]
    def k6(s_ref, w_ref, o_ref):
        o_ref[:] = lax.dot_general(
            s_ref[:], w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).transpose(1, 2, 0) if False else lax.dot_general(
            s_ref[:], w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    got = probe("dot3d [47,8,128]x[47,64]", k6,
                jax.ShapeDtypeStruct((8, 128, 64), jnp.float32), S, W1)
    if got is not None:
        want = jnp.einsum("fsl,fh->slh", S, W1)
        print(f"     max|diff| vs einsum: {float(jnp.max(jnp.abs(got - want))):.3e}")

    # 7. second-layer 3D contraction over last axis + bias + argmax lanes
    def k7(h_ref, w_ref, hand_ref, o_ref):
        adv = lax.dot_general(
            h_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8,128,104]
        iota = lax.broadcasted_iota(jnp.int32, (8, 128, 104), 2)
        m = iota == hand_ref[:][:, :, None]
        masked = jnp.where(m, adv, -1e9)
        o_ref[:] = jnp.argmax(masked, axis=2).astype(jnp.int32)

    H = jnp.asarray(rng.normal(size=(8, 128, 64)), jnp.float32)
    got = probe("dot3d2+mask+argmax ax2", k7,
                jax.ShapeDtypeStruct((8, 128), jnp.int32), H, Wa, hand)
    if got is not None:
        adv = jnp.einsum("slh,ha->sla", H, Wa)
        iota = lax.broadcasted_iota(jnp.int32, (8, 128, 104), 2)
        want = jnp.argmax(jnp.where(iota == hand[:, :, None], adv, -1e9), axis=2)
        print(f"     exact: {bool(jnp.all(got == want))}")


main2()
