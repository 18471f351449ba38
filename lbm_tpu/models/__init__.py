from . import lbm
