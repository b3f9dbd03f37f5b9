"""Device-mesh sharding: multi-chip / multi-host rendering via shard_map."""
