// Shim for MSVC <process.h>: nothing needed on Linux.
#pragma once
