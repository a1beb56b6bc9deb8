#include "surfaces/surfaces.h"
