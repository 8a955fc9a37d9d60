from .cache import enable_persistent_cache
