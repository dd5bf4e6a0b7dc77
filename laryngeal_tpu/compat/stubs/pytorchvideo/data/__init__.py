from . import clip_sampling, encoded_video  # noqa: F401
from .clip_sampling import ClipInfo, make_clip_sampler  # noqa: F401
