"""Torus conversions, RNG, and profiling helpers."""

from .profiling import (bootstrap_cost, key_memory_usage,
                        speed_of_light_report, trace)
from .rng import binary_key, gaussian_torus, uniform_torus
from .torus import (MOD32, TORUS, f32_to_torus_traced, f64_to_torus,
                    f64_to_torus_vec, to_signed, to_unsigned, torus_not,
                    torus_to_f64)
