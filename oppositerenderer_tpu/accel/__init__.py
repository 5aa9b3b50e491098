from .intersect import Hit, get_backend, intersect, occluded, set_backend

__all__ = ["Hit", "intersect", "occluded", "set_backend", "get_backend"]
