from nbody_tpu.parallel.mesh import make_mesh, DATA_AXIS, PARTICLE_AXIS
from nbody_tpu.parallel.sharding import (
    batch_sharding, replicate, make_sharded_train_step, knn_periodic_sharded)
from nbody_tpu.parallel.ensemble import (
    init_ensemble_params, make_ensemble_train_step, ensemble_apply)
