from . import vecmath, lcg, color, png
