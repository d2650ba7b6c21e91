from . import cells, transfunc
