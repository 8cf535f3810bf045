from . import loader, synthetic, triplets, video  # noqa: F401
