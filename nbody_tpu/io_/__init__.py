from nbody_tpu.io_.saver import Saver, random_model_tag
from nbody_tpu.io_.checkpoint import save_checkpoint, restore_checkpoint, latest_step
