from conan_tpu.parallel.mesh import (  # noqa: F401
    initialize_multihost,
    make_mesh,
    pad_batch_to_multiple,
    replicate,
    shard_batch,
    shard_train_step,
)
