// Shim for MSVC <io.h>: map _access to POSIX access.
#pragma once
#include <unistd.h>
#define _access access
