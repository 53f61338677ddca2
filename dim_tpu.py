"""Short import alias: ``import dim_tpu`` -> ``dyadic_interaction_modeling_tpu``."""

import sys as _sys

import dyadic_interaction_modeling_tpu as _pkg

_sys.modules[__name__] = _pkg
