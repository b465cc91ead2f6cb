from .mesh import make_mesh, shard_batch, replicate, batch_sharding
from .spatial import make_mesh_2d, spatial_image_sharding, make_spatially_sharded_forward
from .tensor import make_mesh_3d, tensor_sharding_tree, make_tensor_parallel_forward
from .multihost import initialize_multihost, dcn_friendly_mesh, process_batch_slice
