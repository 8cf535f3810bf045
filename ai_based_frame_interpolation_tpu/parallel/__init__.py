from .mesh import (batch_sharding, make_mesh, maybe_init_distributed,  # noqa: F401
                   pad_batch_to_devices, replicated)
