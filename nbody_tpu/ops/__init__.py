from nbody_tpu.ops.knn import knn_periodic, knn_periodic_batch, pairwise_min_image_sq_dist
from nbody_tpu.ops.graph_features import edge_features_za
