from .auto_reg_nn import AutoRegressiveNN, ConditionalAutoRegressiveNN
from .dense_nn import ConditionalDenseNN, DenseNN
from .module import clear_module_registry, flax_module, random_flax_module

__all__ = [
    "AutoRegressiveNN",
    "ConditionalAutoRegressiveNN",
    "ConditionalDenseNN",
    "DenseNN",
    "clear_module_registry",
    "flax_module",
    "random_flax_module",
]
