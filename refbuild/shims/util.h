// Linux compatibility shim standing in for the reference's missing `util.h`
// (included by /root/reference/stereoMatching.h:2 and main_.cpp:3 but absent
// from the repo — see SURVEY.md). Supplies createDirectory() used at
// stereoMatching.h:1730 plus MSVC intrinsic/stdio aliases so the reference
// builds with g++ for baseline measurement. This file is OUR code.
#pragma once
#include <string>
#include <cstdio>
#include <sys/stat.h>
#include <sys/types.h>

#ifndef _MSC_VER
#include <unistd.h>
#include <algorithm>
#include <iostream>
using std::max;
using std::min;
using std::cout;  // reference NL/*.cpp use bare cout/endl under MSVC laxness
using std::endl;
#define _access access
#define printf_s printf
#define fscanf_s fscanf
#define __popcnt __builtin_popcount
#define __popcnt64 __builtin_popcountll
typedef long long __int64;
typedef int errno_t;
static inline errno_t fopen_s(FILE** f, const char* name, const char* mode) {
  *f = fopen(name, mode);
  return *f ? 0 : 1;
}
#endif

// The reference builds paths with '\\' separators; on Linux those are plain
// filename characters, so artifacts land as flat files under the (existing)
// root directory. mkdir the literal string so behavior stays consistent.
static inline void createDirectory(const char* path) {
  mkdir(path, 0755);  // EEXIST/backslash-names are fine; artifacts are flat
}
