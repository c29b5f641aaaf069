"""scipy-1.2.1 statistical replicas in the reference's calling convention.

The reference calls ``mannwhitneyu(a, b)`` / ``ks_2samp(a, b)`` and unpacks
``st, p`` (ref bin/scripts/myDetect.py:331,341).  Today's scipy changed
mannwhitneyu's defaults (two-sided, exact-capable) and ks_2samp's p
computation, so running the translated reference against modern scipy
would diverge from its pinned env (env.py27nanomod.yml: scipy 1.2.1).
These wrappers re-pin the semantics using the same replicas that generate
the golden fixtures (tests/golden/make_golden.py).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "golden"))
from make_golden import ks_numerator, ks_p_121, mwu_121  # noqa: E402


def mwu_121_scipy_like(a, b):
    return mwu_121(np.asarray(a, np.float64), np.asarray(b, np.float64))


def ks_2samp_121(a, b):
    num, n1, n2 = ks_numerator(np.asarray(a, np.float64),
                               np.asarray(b, np.float64))
    d = num / (float(n1) * float(n2))
    return d, ks_p_121(d, n1, n2)
