"""Parallelism: device mesh, sharding placement, multi-host bootstrap."""
