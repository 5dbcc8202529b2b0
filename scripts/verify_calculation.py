#!/usr/bin/env python3
"""Analytic flux verification (counterpart of scripts/verify_calculation.py):
checks orbital flux at known geometric configurations against closed-form
values."""

import math
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qingdai_tpu import constants as const
from qingdai_tpu.physics import orbital


def main():
    ok = True

    # t=0: planet at (a_p, 0), A at (r_A, 0), B at (−r_B, 0)
    d_A = const.A_PLANET - orbital.R_A
    d_B = const.A_PLANET + orbital.R_B
    S_expect = (const.L_A / (4 * math.pi * d_A ** 2)
                + const.L_B / (4 * math.pi * d_B ** 2))
    S_got = float(orbital.total_flux(0.0))
    err = abs(S_got - S_expect) / S_expect
    print(f"[Verify] t=0 flux: got {S_got:.4f}, analytic {S_expect:.4f}, "
          f"rel err {err:.2e} {'OK' if err < 1e-5 else 'FAIL'}")
    ok &= err < 1e-5

    # Kepler periods
    ratio = (orbital.T_PLANET / orbital.T_BINARY) ** 2
    expect = (const.A_PLANET / const.A_BINARY) ** 3
    err = abs(ratio - expect) / expect
    print(f"[Verify] Kepler T²∝a³: rel err {err:.2e} {'OK' if err < 1e-10 else 'FAIL'}")
    ok &= err < 1e-10

    # flux range over a year
    ts = np.linspace(0, orbital.T_PLANET, 4096)
    S = np.asarray(orbital.total_flux(ts))
    print(f"[Verify] flux over orbit: min {S.min():.1f}, max {S.max():.1f} W/m² "
          f"(variability {(S.max()/S.min()-1)*100:.2f}%)")
    ok &= bool(np.all(S > 0))

    print(f"[Verify] {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
