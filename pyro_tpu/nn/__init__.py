from .auto_reg_nn import AutoRegressiveNN, ConditionalAutoRegressiveNN
from .pyro_module import (
    PyroModule,
    PyroModuleList,
    PyroParam,
    PyroSample,
    pyro_method,
    to_pyro_module_,
)
from .dense_nn import MaskedLinear, ConditionalDenseNN, DenseNN
from .module import clear_module_registry, flax_module, random_flax_module
from .recurrent import RNN, GRUCell

__all__ = [
    "RNN",
    "GRUCell",
    "MaskedLinear",
    "PyroModule",
    "PyroModuleList",
    "PyroParam",
    "PyroSample",
    "pyro_method",
    "to_pyro_module_",
    "AutoRegressiveNN",
    "ConditionalAutoRegressiveNN",
    "ConditionalDenseNN",
    "DenseNN",
    "clear_module_registry",
    "flax_module",
    "random_flax_module",
]
