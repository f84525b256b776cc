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
        impl = f.attrs["prng_impl"]
        if isinstance(impl, bytes):
            impl = impl.decode()
        meta = {k: f.attrs[k] for k in f.attrs
                if k not in ("version", "prng_impl")}
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
