"""Mid-sampling checkpoint / resume.

The reference can only resume ANALYSIS from its HDF5 results dump -- a killed
sampling run loses the chain (SURVEY.md section 5, checkpoint row). Here the
production run is segmented on the host; after each device segment the chain
block and full sampler state (positions, lnprob, counters, PRNG key data)
are flushed to an HDF5 checkpoint, so sampling itself is resumable.
"""

from __future__ import annotations

import os

import numpy as np
import h5py
import jax
import jax.numpy as jnp

from mbb_emcee_tpu.sampler import SamplerState

_VERSION = 1


def data_fingerprint(*arrays) -> str:
    """Content hash of the photometry a run was sampling. Stored in
    checkpoint meta and re-checked on resume: resuming after the data
    changed (same geometry, different fluxes) would silently splice
    chains from two different posteriors."""
    import hashlib
    h = hashlib.sha256()
    for a in arrays:
        if a is None:
            h.update(b"\x00none")
            continue
        arr = np.asarray(a)
        if arr.dtype.kind in "fiub":
            arr = np.ascontiguousarray(arr, np.float64)
            h.update(arr.shape.__repr__().encode())
            h.update(arr.tobytes())
        else:  # band names etc.
            h.update(repr(arr.tolist()).encode())
    return h.hexdigest()[:32]


def _key_to_np(key):
    return np.asarray(jax.random.key_data(key))


def _key_from_np(data, impl):
    return jax.random.wrap_key_data(jnp.asarray(data), impl=impl)


def save_checkpoint(path, state: SamplerState, chain_blocks, lnp_blocks,
                    meta: dict, prng_impl: str):
    """Write/overwrite the checkpoint atomically (tmp file + rename)."""
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.attrs["version"] = _VERSION
        f.attrs["prng_impl"] = prng_impl
        for k, v in meta.items():
            f.attrs[k] = v
        st = f.create_group("State")
        st.create_dataset("key", data=_key_to_np(state.key))
        st.create_dataset("pos_a", data=np.asarray(state.pos_a))
        st.create_dataset("pos_b", data=np.asarray(state.pos_b))
        st.create_dataset("lnp_a", data=np.asarray(state.lnp_a))
        st.create_dataset("lnp_b", data=np.asarray(state.lnp_b))
        st.create_dataset("naccept",
                          data=np.asarray(jnp.concatenate(
                              [jnp.atleast_1d(c) for c in
                               (state.naccept if isinstance(state.naccept,
                                                            tuple)
                                else (state.naccept,))])))
        st.attrs["naccept_is_tuple"] = isinstance(state.naccept, tuple)
        st.create_dataset("nsteps", data=int(state.nsteps))
        if chain_blocks:
            f.create_dataset("ChainSoFar",
                             data=np.concatenate(chain_blocks, axis=0),
                             compression="gzip", compression_opts=4)
            f.create_dataset("LnpSoFar",
                             data=np.concatenate(lnp_blocks, axis=0),
                             compression="gzip", compression_opts=4)
    os.replace(tmp, path)


def load_checkpoint(path):
    """Returns (state, chain_so_far, lnp_so_far, meta)."""
    with h5py.File(path, "r") as f:
        if f.attrs.get("multi", False):
            raise ValueError(
                f"{path} is a MultiFitter checkpoint, not a single-fit one")
        impl = f.attrs["prng_impl"]
        if isinstance(impl, bytes):
            impl = impl.decode()
        meta = {k: f.attrs[k] for k in f.attrs if k != "version"}
        meta["prng_impl"] = impl
        st = f["State"]
        naccept = jnp.asarray(np.asarray(st["naccept"]))
        if st.attrs.get("naccept_is_tuple", False):
            half = naccept.shape[0] // 2
            naccept = (naccept[:half], naccept[half:])
        state = SamplerState(
            key=_key_from_np(np.asarray(st["key"]), impl),
            pos_a=jnp.asarray(np.asarray(st["pos_a"])),
            pos_b=jnp.asarray(np.asarray(st["pos_b"])),
            lnp_a=jnp.asarray(np.asarray(st["lnp_a"])),
            lnp_b=jnp.asarray(np.asarray(st["lnp_b"])),
            naccept=naccept,
            nsteps=jnp.array(int(np.asarray(st["nsteps"])), jnp.int32))
        chain = np.asarray(f["ChainSoFar"]) if "ChainSoFar" in f else None
        lnp = np.asarray(f["LnpSoFar"]) if "LnpSoFar" in f else None
    return state, chain, lnp, meta


def save_multi_checkpoint(path, state, chain_blocks, lnp_blocks,
                          meta: dict, prng_impl: str):
    """Batched (MultiFitter) checkpoint: MultiSamplerState + per-source
    chain blocks, written atomically. Chain blocks concatenate on the
    RECORD axis (axis 1 of (S, nrec, nw, nfree))."""
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.attrs["version"] = _VERSION
        f.attrs["prng_impl"] = prng_impl
        f.attrs["multi"] = True
        for k, v in meta.items():
            f.attrs[k] = v
        st = f.create_group("State")
        st.create_dataset("key", data=_key_to_np(state.key))
        st.create_dataset("pos", data=np.asarray(state.pos))
        st.create_dataset("lnp", data=np.asarray(state.lnp))
        st.create_dataset("naccept", data=np.asarray(state.naccept))
        st.create_dataset("nsteps", data=int(state.nsteps))
        if chain_blocks:
            f.create_dataset("ChainSoFar",
                             data=np.concatenate(chain_blocks, axis=1),
                             compression="gzip", compression_opts=4)
            f.create_dataset("LnpSoFar",
                             data=np.concatenate(lnp_blocks, axis=1),
                             compression="gzip", compression_opts=4)
    os.replace(tmp, path)


def load_multi_checkpoint(path):
    """Returns (MultiSamplerState, chain_so_far, lnp_so_far, meta)."""
    from mbb_emcee_tpu.ops.pallas_multifit import MultiSamplerState
    with h5py.File(path, "r") as f:
        if not f.attrs.get("multi", False):
            raise ValueError(
                f"{path} is a single-fit checkpoint, not a MultiFitter one")
        impl = f.attrs["prng_impl"]
        if isinstance(impl, bytes):
            impl = impl.decode()
        meta = {k: f.attrs[k] for k in f.attrs
                if k not in ("version", "prng_impl", "multi")}
        meta["prng_impl"] = impl
        st = f["State"]
        state = MultiSamplerState(
            key=_key_from_np(np.asarray(st["key"]), impl),
            pos=jnp.asarray(np.asarray(st["pos"])),
            lnp=jnp.asarray(np.asarray(st["lnp"])),
            naccept=jnp.asarray(np.asarray(st["naccept"])),
            nsteps=jnp.array(int(np.asarray(st["nsteps"])), jnp.int32))
        chain = np.asarray(f["ChainSoFar"]) if "ChainSoFar" in f else None
        lnp = np.asarray(f["LnpSoFar"]) if "LnpSoFar" in f else None
    return state, chain, lnp, meta


def check_resume_meta(meta, expect: dict, path):
    """Refuse resuming under a different engine than the one that wrote
    the checkpoint: splicing chains from different sampler/lnprob
    backends or PRNG implementations is statistically valid MCMC but
    silently breaks the documented determinism contract (same seed ->
    bitwise-identical chains), so it must be explicit, not accidental."""
    for k, want in expect.items():
        got = meta.get(k)
        if isinstance(got, bytes):
            got = got.decode()
        if got is not None and str(got) != str(want):
            raise ValueError(
                f"checkpoint {path} was written with {k}={got!r}; this "
                f"fitter is configured with {k}={want!r} -- resume with "
                f"the original configuration (or start a fresh run)")
