from construction_clip_tpu.models.clip.model import (
    init_clip,
    encode_image,
    encode_text,
    clip_forward,
)
