"""Online serving: dynamic batcher + HTTP endpoint over the jitted predict."""
from .batcher import DynamicBatcher, default_buckets
from .server import create_server, main

__all__ = ["DynamicBatcher", "default_buckets", "create_server", "main"]
