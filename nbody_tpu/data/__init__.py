from nbody_tpu.data.grid import grid_positions, grid_positions_np
from nbody_tpu.data.dataset import Dataset, load_cube_file, features_from_raw
from nbody_tpu.data.synthetic import synthetic_raw_cubes
