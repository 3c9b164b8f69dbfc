from .sharding import make_mesh, batch_sharding, replicate
