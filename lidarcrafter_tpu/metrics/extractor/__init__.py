from .pointnet import PointNetFeatureExtractor, convert_pointnet_state_dict  # noqa: F401
from .rangenet import RangeNet, convert_rangenet_state_dict, preprocess_range_input  # noqa: F401
from .pointmlp import PointMLP, point_mlp, point_mlp_elite  # noqa: F401
from .sparse_unet import MinkowskiNet, SPVCNN, aggregate_sectors  # noqa: F401
