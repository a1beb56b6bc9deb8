#include "lights/area_light.h"
