from . import segment, splat, rasterize, sparse
