from . import d2q9
