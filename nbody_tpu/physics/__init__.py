from nbody_tpu.physics.pbc import (
    min_image_diff, min_image_sq_dist, wrap_coords, readout_wrap)
from nbody_tpu.physics.losses import loss_za, pbc_loss, mse_za
from nbody_tpu.physics.baseline import calculate_timestep, linear_velocity_pred, l2_dist
