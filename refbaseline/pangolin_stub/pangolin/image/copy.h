#pragma once
#include <pangolin/stub_core.h>
