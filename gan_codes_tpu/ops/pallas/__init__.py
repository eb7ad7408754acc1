from .fused_affine import (fused_double_affine_leaky,  # noqa: F401
                           reference_double_affine_leaky)
