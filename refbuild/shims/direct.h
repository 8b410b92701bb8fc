// Shim for MSVC <direct.h>: map _mkdir to POSIX mkdir.
#pragma once
#include <sys/stat.h>
#include <sys/types.h>
#define _mkdir(p) mkdir((p), 0755)
