from .sharding import ShardedDomain, make_device_mesh, sharded_impose_bc

__all__ = ["ShardedDomain", "make_device_mesh", "sharded_impose_bc"]
