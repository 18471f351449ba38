from . import (d2q9, d2q9_native, d2q9_pallas, d3q19, d3q19_lattice,
               d3q19_native, d3q19_pallas, stencil)
