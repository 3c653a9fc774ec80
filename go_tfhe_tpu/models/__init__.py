"""Homomorphic circuits — the framework's 'model zoo'.

The reference ships these as example programs (examples/*/main.go); here they
are reusable, batched library functions.
"""

from .adders import (add8_pbs, full_adder, half_adder, make_adder_luts,
                     ripple_carry_add)
