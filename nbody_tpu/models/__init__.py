from nbody_tpu.models.base import init_layer_params, init_network_params
from nbody_tpu.models.set_net import set_layer, set_network, init_set_params
from nbody_tpu.models import registry
