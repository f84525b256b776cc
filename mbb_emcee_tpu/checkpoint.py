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

_VERSION = 2


def _segment_order(group):
    """Segment names ordered by their integer suffix: lexicographic sort
    would splice seg100000 before seg99999 once the zero padding is
    exhausted -- silently scrambled chain order."""
    return sorted(group, key=lambda n: int(n[3:]))


def new_run_id() -> str:
    """Unique id tying a checkpoint file's segments to ONE run: a fresh
    run flushing to a path that still holds an unrelated old checkpoint
    must overwrite it, never adopt its segments as a prefix."""
    import secrets
    return secrets.token_hex(8)


def _write_segments(f, prev_path, chain_blocks, lnp_blocks, axis):
    """Flush chain/lnp blocks as APPEND-ONLY segments.

    Naively re-concatenating and re-GZIPPING the whole accumulated chain
    on every checkpoint interval dominates long runs. Instead the
    already-flushed records are copied RAW from the previous checkpoint
    file (h5py Group.copy -> H5Ocopy moves compressed chunks without
    re-filtering) and only records beyond them are compressed: the
    expensive gzip work is O(new segment) per flush. The raw byte copy
    is still O(total-so-far) per flush (the atomic tmp+rename protocol
    rewrites one self-contained file); at HDF5 raw-copy bandwidth that
    is cheap for any chain that fits this problem (tens of MB-GB) --
    a per-segment-file manifest would make it O(new) outright at the
    cost of multi-file checkpoints. Layout: /Segments/segNNNNN/{Chain,
    Lnp}, ordered by the integer suffix."""
    segs = f.create_group("Segments")
    nseg = 0
    nrec_prev = 0
    run_id = f.attrs.get("run_id")
    if prev_path is not None and os.path.exists(prev_path):
        try:
            with h5py.File(prev_path, "r") as prev:
                prev_id = prev.attrs.get("run_id")
                if isinstance(prev_id, bytes):
                    prev_id = prev_id.decode()
                if isinstance(run_id, bytes):
                    run_id = run_id.decode()
                if (run_id is None or prev_id is None
                        or str(prev_id) != str(run_id)):
                    raise OSError("different run; flush fresh")
                if "Segments" in prev:
                    for name in _segment_order(prev["Segments"]):
                        prev.copy(prev["Segments"][name], segs, name=name)
                        nrec_prev += segs[name]["Chain"].shape[axis]
                        nseg += 1
        except OSError:
            # Previous file belongs to a different run, or is unreadable
            # (a partial write the atomic rename protocol should
            # prevent): flush everything fresh instead of adopting it.
            for name in list(segs):
                del segs[name]
            nseg = nrec_prev = 0
    total = sum(b.shape[axis] for b in chain_blocks)
    new = total - nrec_prev
    if new > 0:
        # Only the tail blocks covering the new records are touched --
        # the accumulated prefix is never concatenated again.
        tail_c, tail_l, have = [], [], 0
        for b_c, b_l in zip(reversed(chain_blocks), reversed(lnp_blocks)):
            tail_c.append(b_c)
            tail_l.append(b_l)
            have += b_c.shape[axis]
            if have >= new:
                break
        chain = np.concatenate(tail_c[::-1], axis=axis)
        lnp = np.concatenate(tail_l[::-1], axis=axis)
        sl = [slice(None)] * chain.ndim
        sl[axis] = slice(have - new, None)
        g = segs.create_group(f"seg{nseg:05d}")
        g.create_dataset("Chain", data=chain[tuple(sl)],
                         compression="gzip", compression_opts=4)
        sl_l = sl[:lnp.ndim]
        g.create_dataset("Lnp", data=lnp[tuple(sl_l)],
                         compression="gzip", compression_opts=4)


def _read_segments(f, axis):
    """(chain, lnp) concatenated from v2 segments or the v1 datasets;
    (None, None) if nothing was flushed."""
    if "Segments" in f and len(f["Segments"]):
        names = _segment_order(f["Segments"])
        chain = np.concatenate(
            [np.asarray(f["Segments"][n]["Chain"]) for n in names],
            axis=axis)
        lnp = np.concatenate(
            [np.asarray(f["Segments"][n]["Lnp"]) for n in names],
            axis=axis)
        return chain, lnp
    if "ChainSoFar" in f:
        return np.asarray(f["ChainSoFar"]), np.asarray(f["LnpSoFar"])
    return None, None


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


def spec_fingerprint(spec, shape, a) -> str:
    """Content hash of the POSTERIOR a run was sampling: box limits,
    priors, fixed params, photometric-uplim mask, model shape flags, and
    the stretch parameter a. Stored in checkpoint meta and re-checked on
    resume -- resuming after set_gaussian_prior/set_lowlim/fix_param (or
    a changed a=) would silently splice chains from two different
    targets, exactly the failure class data_fingerprint guards for the
    data side."""
    uplim = (None if spec.uplim_bands is None
             else np.asarray(spec.uplim_bands))
    return data_fingerprint(
        spec.lower, spec.upper, spec.fixed, spec.fixed_values,
        spec.prior_mean, spec.prior_isigma, uplim,
        np.asarray([float(shape.opthin), float(shape.noalpha),
                    float(shape.wavenorm), float(a)]))


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
            _write_segments(f, path, chain_blocks, lnp_blocks, axis=0)
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
        chain, lnp = _read_segments(f, axis=0)
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
            _write_segments(f, path, chain_blocks, lnp_blocks, axis=1)
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
        chain, lnp = _read_segments(f, axis=1)
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


def save_tier_checkpoint(path, tier, state_arrays, chain_blocks,
                         lnp_blocks, meta: dict, prng_impl: str, axis=1,
                         aux_arrays=None):
    """Checkpoint for the non-stretch batch tiers (PT / HMC): the State
    group holds ARBITRARY named per-source arrays (a 'key' entry is
    stored via jax.random.key_data), chain blocks append through the
    same O(new)-gzip segment machinery as the stretch tiers, and
    `aux_arrays` (e.g. PT stepping-stone accumulators, per-source
    ladders) ride in an Aux group. Written atomically."""
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.attrs["version"] = _VERSION
        f.attrs["prng_impl"] = prng_impl
        f.attrs["multi"] = True
        f.attrs["tier"] = tier
        for k, v in meta.items():
            f.attrs[k] = v
        st = f.create_group("State")
        for name, arr in state_arrays.items():
            if name == "key":
                st.create_dataset("key", data=_key_to_np(arr))
            else:
                st.create_dataset(name, data=np.asarray(arr))
        if aux_arrays:
            ax = f.create_group("Aux")
            for name, arr in aux_arrays.items():
                ax.create_dataset(name, data=np.asarray(arr))
        if chain_blocks:
            _write_segments(f, path, chain_blocks, lnp_blocks, axis=axis)
    os.replace(tmp, path)


def load_tier_checkpoint(path, tier):
    """Returns (state_arrays dict, aux_arrays dict, chain_so_far,
    lnp_so_far, meta). The 'key' state entry comes back as a JAX PRNG
    key array; everything else as numpy."""
    with h5py.File(path, "r") as f:
        got = f.attrs.get("tier", b"")
        if isinstance(got, bytes):
            got = got.decode()
        if got != tier:
            raise ValueError(
                f"{path} is a {got or 'stretch-move'!r} checkpoint, not "
                f"a {tier!r} one")
        impl = f.attrs["prng_impl"]
        if isinstance(impl, bytes):
            impl = impl.decode()
        meta = {k: f.attrs[k] for k in f.attrs
                if k not in ("version", "prng_impl", "multi", "tier")}
        meta["prng_impl"] = impl
        state = {}
        for name in f["State"]:
            if name == "key":
                state["key"] = _key_from_np(
                    np.asarray(f["State"]["key"]), impl)
            else:
                state[name] = np.asarray(f["State"][name])
        aux = {}
        if "Aux" in f:
            for name in f["Aux"]:
                aux[name] = np.asarray(f["Aux"][name])
        chain, lnp = _read_segments(f, axis=1)
    return state, aux, chain, lnp, meta
