"""Self-contained NumPy/SciPy oracle mirroring the reference semantics.

Neither /root/reference (empty mount) nor `emcee`/`astropy` are importable in
this environment, so this package is the parity oracle mandated by
SURVEY.md section 4 item 2: an independent fp64 implementation of the
modified blackbody (scipy brentq + quad), a minimal Goodman-Weare ensemble
sampler equivalent to emcee's stretch move, and adaptive-quadrature derived
quantities. It is validated against analytic expectations, then used as the
<=1% posterior-parity oracle and as the CPU baseline for bench.py.
"""

from tests.reference_impl.mbb_oracle import ModifiedBlackbodyOracle
from tests.reference_impl.gw_sampler import GoodmanWeareSampler
