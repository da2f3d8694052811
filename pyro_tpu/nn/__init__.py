from .module import clear_module_registry, flax_module, random_flax_module

__all__ = ["clear_module_registry", "flax_module", "random_flax_module"]
