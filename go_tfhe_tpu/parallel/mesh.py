"""Device-mesh sharding for batched TFHE workloads.

Design (SURVEY.md §2 "Parallelism inventory"): the bootstrap is
embarrassingly parallel over independent ciphertexts, so the one production
sharding is

* ciphertext batch axis  -> sharded over the mesh ('batch'),
* keys (BSK/KSK/testvec) -> replicated (34-70 MB per profile — cheap vs. ICI
  all-gathers inside the 700-step loop).

With these in/out shardings GSPMD compiles the *same* jitted bootstrap into a
fully local per-chip program — zero collectives in the hot loop; ICI is only
used if a caller reshards.  Scaling to multi-host pods is
``jax.distributed.initialize`` + the same code (keys replicated per host over
DCN once at startup).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import engine
from ..keys import CloudKey

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, ct: jax.Array, axis_name: str = BATCH_AXIS):
    """Place ciphertexts with the leading batch dim sharded over the mesh."""
    spec = P(axis_name, *([None] * (ct.ndim - 1)))
    return jax.device_put(ct, NamedSharding(mesh, spec))


def replicate_keys(mesh: Mesh, ck: CloudKey) -> CloudKey:
    """Replicate every key array on all mesh devices."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), ck)


def sharded_bootstrap(mesh: Mesh, ck: CloudKey, ct: jax.Array,
                      testvec: jax.Array | None = None,
                      axis_name: str = BATCH_AXIS) -> jax.Array:
    """Batched bootstrap with the batch axis sharded over the mesh.

    ``ct``: (B, lwe_n+1) with B divisible by the mesh size.  The jitted
    program is identical to the single-chip one; GSPMD partitions it.
    """
    ck = replicate_keys(mesh, ck)
    ct = shard_batch(mesh, ct, axis_name)
    if testvec is not None and testvec.ndim > 2:
        testvec = shard_batch(mesh, testvec, axis_name)
    return engine.bootstrap(ck, ct, testvec)


def sharded_bootstrap_pallas(mesh: Mesh, ck: CloudKey, ct: jax.Array,
                             testvec: jax.Array | None = None,
                             axis_name: str = BATCH_AXIS,
                             key_switch: bool = True) -> jax.Array:
    """Batch-sharded bootstrap through the PALLAS fast path via shard_map.

    GSPMD cannot partition a ``pallas_call`` on its own, and the plain
    ``engine.bootstrap`` pads the GLOBAL batch to the kernel tile before
    sharding (wrong granularity on a mesh).  This wrapper runs the Pallas
    core per shard: every device pads ITS OWN batch shard to the kernel
    tile and executes the fused blind-rotate kernel locally — zero
    collectives, identical math to the single-chip path.

    ``ct``: (B, lwe_n+1) with B divisible by the mesh size.  Keys must be
    replicated (see :func:`replicate_keys`) or will be resharded by the
    shard_map in_specs.
    """
    import jax.numpy as jnp
    from jax import shard_map

    p = ck.params
    assert p.poly_extend_factor == 1, (
        "extended profiles are not supported by the sharded Pallas wrapper "
        "(the (k,2,N) accumulator layout would shard the k axis as batch); "
        "use sharded_bootstrap, which routes through engine.bootstrap")
    assert ck.bsk_band is not None or ck.bsk_band_rev is not None, \
        "profile not Pallas-eligible (no packed band on the CloudKey)"
    assert ct.shape[0] % mesh.devices.size == 0

    tv = ck.testvec if testvec is None else testvec
    tv_spec = P() if tv.ndim == 2 else P(axis_name)
    # Prefer the engine's default core for the profile: half-batch
    # pipelined (ops/pallas_pipe.py) > transposed two-kernel > row-major.
    use_t = ck.bsk_band_rev is not None
    band = ck.bsk_band_rev if use_t else ck.bsk_band
    if use_t and engine.PREFER_PIPE and p.digit_limbs == 1:
        core = engine._bootstrap_core_pipe
    elif use_t:
        core = engine._bootstrap_core_t
    else:
        core = engine._bootstrap_core_tpu

    def local(bsk_band, ksk, tv_l, ct_l):
        b = ct_l.shape[0]
        pad = (-b) % engine._TPU_BATCH_TILE          # per-shard padding
        if pad:
            ct_l = jnp.concatenate(
                [ct_l, jnp.zeros((pad, ct_l.shape[-1]), ct_l.dtype)])
            if tv_l.ndim > 2:
                tv_l = jnp.concatenate(
                    [tv_l, jnp.zeros((pad,) + tv_l.shape[1:], tv_l.dtype)])
        out = core(p, key_switch, bsk_band, ksk, ct_l, tv_l)
        return out[:b]

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, so the rep checker cannot see through the kernel.
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), tv_spec, P(axis_name)),
                   out_specs=P(axis_name), check_vma=False)
    return fn(band, ck.ksk, tv, ct)


def multihost_initialize(**kwargs) -> None:
    """Multi-host entry point: wraps jax.distributed.initialize."""
    jax.distributed.initialize(**kwargs)
