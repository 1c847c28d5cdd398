from construction_clip_tpu.models.clipcap.model import (
    init_clipcap, clipcap_forward, caption_loss, map_prefix)
