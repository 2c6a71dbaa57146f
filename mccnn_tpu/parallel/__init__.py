from mccnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from mccnn_tpu.parallel.train import make_dp_train_step, shard_batch  # noqa: F401
from mccnn_tpu.parallel.match import make_sharded_match  # noqa: F401
