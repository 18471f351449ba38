from . import blur, lbm, lbm3d
