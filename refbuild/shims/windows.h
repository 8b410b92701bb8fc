// Minimal win32 API shim for NL/qx_basic.cpp's qx_timer (QueryPerformanceCounter).
#pragma once
#include <chrono>
#include <iostream>
using std::cout;  // qx_basic.cpp uses bare `cout` relying on MSVC's lax lookup

typedef union _LARGE_INTEGER {
  struct { unsigned long LowPart; long HighPart; } u;
  long long QuadPart;
} LARGE_INTEGER;

static inline int QueryPerformanceFrequency(LARGE_INTEGER* li) {
  li->QuadPart = 1000000000LL;  // report ns resolution
  return 1;
}

static inline int QueryPerformanceCounter(LARGE_INTEGER* li) {
  li->QuadPart = std::chrono::duration_cast<std::chrono::nanoseconds>(
                     std::chrono::steady_clock::now().time_since_epoch())
                     .count();
  return 1;
}
