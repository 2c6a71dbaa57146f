from mccnn_tpu.data.dataset import StereoDataset, load_grayscale  # noqa: F401
from mccnn_tpu.data.sampler import TripletSampler  # noqa: F401
