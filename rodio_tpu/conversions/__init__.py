from .channels import RechannelNode, rechannel_block
from .resample import Resample, resample_output_frames
from .uniform import Uniform
