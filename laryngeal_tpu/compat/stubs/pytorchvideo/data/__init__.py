from . import encoded_video  # noqa: F401
