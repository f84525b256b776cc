"""A ready-to-serve model file for `run_sed_tpu`.

    run_sed_tpu examples/two_temp_model.py catalog.txt out.h5 \\
        -w 128 -b 200 -n 600 --prior beta 1.8 0.4 \\
        --initval T_cold 18 --initval T_warm 45 \\
        --get-lir --ppc --summary

Defines the canonical custom model -- a two-temperature greybody (cold
+ warm dust component, shared emissivity beta; cf. Dunne & Eales 2001)
-- as a module-level `MODEL`. Any pure-JAX `fnu(theta, wave)` works the
same way; see `mbb_emcee_tpu.sed.SEDModel` for the contract (wave of
any shape in observed-frame um, f_nu out in mJy, jax-traceable).
"""

import jax.numpy as jnp

from mbb_emcee_tpu import SEDModel, log_mbb_fnu
from mbb_emcee_tpu.models.modified_blackbody import MBBShape

_SHAPE = MBBShape(opthin=True, noalpha=True)


def two_temp_fnu(theta, wave):
    """Cold + warm greybody, shared beta.

    theta = (T_cold, T_warm, beta, fnorm_cold, fnorm_warm); each
    component reuses the validated single-MBB primitive (lambda0/alpha
    slots are inert under opthin+noalpha)."""
    t_c, t_w, beta, f_c, f_w = theta
    p_c = jnp.stack([t_c, beta, 250.0, 4.0, f_c])
    p_w = jnp.stack([t_w, beta, 250.0, 4.0, f_w])
    return (jnp.exp(log_mbb_fnu(p_c, wave, _SHAPE))
            + jnp.exp(log_mbb_fnu(p_w, wave, _SHAPE)))


# Disjoint temperature ranges break the component-swap symmetry (the
# cheap way; run_sed_tpu --pt handles genuinely multimodal cases).
MODEL = SEDModel(
    fnu=two_temp_fnu,
    param_names=("T_cold", "T_warm", "beta", "fnorm_cold", "fnorm_warm"),
    lower=[5.0, 25.0, 0.5, 1e-3, 1e-4],
    upper=[25.0, 120.0, 4.0, 1e3, 1e2],
    name="two-temp-greybody")
