"""On-hardware validation checklist: run after TPU (re)connection.

The tunneled TPU in this environment wedges for hours at a time
(observed 2026-08-17/18); this script packs every hardware-dependent
check into one bounded command so a recovered tunnel can be validated
immediately:

    python tools/tpu_checklist.py            # ~10-20 min cold cache
    python tools/tpu_checklist.py --quick    # smoke + bench only

Each step runs in a SUBPROCESS with a hard timeout (a wedged tunnel
hangs forever in-process; the probe must be expendable), and the
summary prints one PASS/FAIL line per step.
"""

import argparse
import subprocess
import sys
import time

STEPS = [
    # (name, timeout_s, quick?, code-or-argv)
    ("probe", 120, True,
     "import numpy as np, jax, jax.numpy as jnp\n"
     "assert jax.default_backend() == 'tpu', jax.default_backend()\n"
     "y = jax.jit(lambda a: a + 1)(jnp.ones((8, 8)))\n"
     "assert float(np.asarray(y)[0, 0]) == 2.0\n"),
    ("cli_fit", 600, True, ["__CLI__"]),
    ("bench", 900, True, [sys.executable, "bench.py"]),
    ("parity_validator", 2400, False,
     [sys.executable, "tools/validate_tpu_parity.py"]),
    ("fused_multifit_smoke", 900, False,
     "import numpy as np, jax, jax.numpy as jnp\n"
     "from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape\n"
     "from mbb_emcee_tpu import MultiFitter\n"
     "shape = MBBShape(opthin=True, noalpha=True)\n"
     "wave = np.linspace(100., 500., 5)\n"
     "rng = np.random.default_rng(1)\n"
     "t = np.column_stack([rng.uniform(25, 45, 16), rng.uniform(1.5, 2.1, 16),\n"
     "                     np.full(16, 250.), np.full(16, 4.),\n"
     "                     rng.uniform(20, 60, 16)])\n"
     "flux = np.stack([np.asarray(mbb_fnu(jnp.asarray(x, jnp.float32),\n"
     "                 jnp.asarray(wave, jnp.float32), shape)) for x in t])\n"
     "unc = 0.05 * flux\n"
     "flux = flux + unc * rng.standard_normal(flux.shape)\n"
     "# ragged: missing band + per-source upper limit through the kernel\n"
     "flux[3, 0] = np.nan; unc[3, 0] = np.nan\n"
     "m = np.zeros((16, 5), bool); m[5, 4] = True\n"
     "mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=3,\n"
     "                 sampler_backend='fused')\n"
     "mf.set_data(wave, flux, unc)\n"
     "mf.set_phot_upperlimits(m)\n"
     "mf.run(nburn=60, nsteps=200)\n"
     "cen = mf.par_cen('T')\n"
     "assert np.all(np.abs(cen[:, 0] - t[:, 0]) < 10.0), cen[:, 0]\n"
     "mf.extend(200)\n"
     "assert mf.chain_free.shape[1] == 400\n"
     "print('fused ragged batch + extend ok')\n"),
    ("corr_xla_on_tpu", 900, False,
     "import numpy as np, jax, jax.numpy as jnp\n"
     "from mbb_emcee_tpu.models.modified_blackbody import mbb_fnu, MBBShape\n"
     "from mbb_emcee_tpu import MultiFitter\n"
     "shape = MBBShape(opthin=True, noalpha=True)\n"
     "wave = np.linspace(100., 500., 5)\n"
     "rng = np.random.default_rng(2)\n"
     "t = np.column_stack([rng.uniform(25, 45, 8), rng.uniform(1.5, 2.1, 8),\n"
     "                     np.full(8, 250.), np.full(8, 4.),\n"
     "                     rng.uniform(20, 60, 8)])\n"
     "flux = np.stack([np.asarray(mbb_fnu(jnp.asarray(x, jnp.float32),\n"
     "                 jnp.asarray(wave, jnp.float32), shape)) for x in t])\n"
     "unc = 0.05 * flux\n"
     "R = 0.3 * np.ones((5, 5)) + 0.7 * np.eye(5)\n"
     "L = np.linalg.cholesky(R)\n"
     "flux = flux + unc * (rng.standard_normal(flux.shape) @ L.T)\n"
     "mf = MultiFitter(nwalkers=64, opthin=True, noalpha=True, seed=3)\n"
     "mf.set_data(wave, flux, unc)\n"
     "mf.set_band_correlation(R)\n"
     "mf.run(nburn=60, nsteps=200)\n"
     "assert mf._backend_used == 'xla'\n"
     "cen = mf.par_cen('T')\n"
     "assert np.all(np.abs(cen[:, 0] - t[:, 0]) < 10.0), cen[:, 0]\n"
     "mf.run_map()\n"
     "assert np.all(np.isfinite(mf.map_lnprob))\n"
     "print('correlated batch + MAP triage on TPU ok')\n"),
]


def run_step(name, timeout, payload):
    if payload == ["__CLI__"]:
        import tempfile
        d = tempfile.mkdtemp()
        phot = f"{d}/phot.txt"
        with open(phot, "w") as fh:
            fh.write("100.0 11.2 0.8\n160.0 32.1 1.9\n250.0 44.8 2.4\n"
                     "350.0 38.2 2.1\n500.0 22.9 1.5\n")
        payload = [sys.executable, "-m", "mbb_emcee_tpu.cli", phot, f"{d}/fit.h5",
                   "-z", "2.2", "-w", "250", "-b", "60", "-n", "300",
                   "--seed", "77", "--get-lir", "--get-peaklambda"]
    argv = (payload if isinstance(payload, list)
            else [sys.executable, "-c", payload])
    t0 = time.time()
    try:
        p = subprocess.run(argv, capture_output=True, timeout=timeout,
                           text=True)
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        ok, tail = False, [f"TIMEOUT after {timeout}s"]
    dt = time.time() - t0
    print(f"[{'PASS' if ok else 'FAIL'}] {name:24s} {dt:7.1f}s")
    for line in tail:
        print(f"         {line}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="probe + CLI fit + bench only")
    args = ap.parse_args()
    results = []
    for name, timeout, quick, payload in STEPS:
        if args.quick and not quick:
            continue
        ok = run_step(name, timeout, payload)
        results.append((name, ok))
        if name == "probe" and not ok:
            print("TPU tunnel still unresponsive; aborting checklist")
            return 1
    failed = [n for n, ok in results if not ok]
    print("\nSummary:", "ALL PASS" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
