from . import blur, lbm
