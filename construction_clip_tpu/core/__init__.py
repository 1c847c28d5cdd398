from construction_clip_tpu.core.mesh import create_mesh, local_mesh, DATA_AXIS, MODEL_AXIS
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY, BF16_POLICY
from construction_clip_tpu.core import configs
