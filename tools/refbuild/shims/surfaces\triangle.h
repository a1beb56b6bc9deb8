#include "surfaces/triangle.h"
