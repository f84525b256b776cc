from mbb_emcee_tpu.utils.fits import read_fits_image

__all__ = ["read_fits_image"]
