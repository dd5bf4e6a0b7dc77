from .server import DynamicBatcher, InferenceServer  # noqa: F401
