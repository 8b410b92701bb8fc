// Golden driver for the reference NL (non-local) disparity flow, used to
// validate our device-resident nl_disparity (mystereomatching_tpu/ops/nl.py)
// against qx_nonlocal_cost_aggregation::disparity(...) including the
// use_nonlocal_post_processing branch (NL/qx_nonlocal_cost_aggregation.cpp:
// 72-109). This file is OUR code; it only drives the reference classes.
//
// Flow: load left/right PNGs + a raw [H,W,D] float32 cost volume, inject it
// exactly like matching_cost() does (backup copy + qx_stereo_flip_corr_vol,
// cpp:58-71), build both MSTs, then run disparity(out, false) and
// disparity(out, true) and dump both maps.
#include "NL/qx_basic.h"
#include "NL/qx_nonlocal_cost_aggregation.h"

#include <cstdio>
#include <fstream>
#include <opencv2/imgproc.hpp>
#include <opencv2/highgui.hpp>

using namespace std;
using namespace cv;

static void dump_u8(unsigned char **m, int h, int w, const string &path) {
  ofstream f(path, ios::binary);
  int32_t dims[2] = {h, w};
  f.write((const char *)dims, 8);
  f.write((const char *)m[0], (size_t)h * w);
}

int main(int argc, char **argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s left.png right.png vol.bin outprefix [sigma]\n",
            argv[0]);
    return 2;
  }
  double sigma = argc > 5 ? atof(argv[5]) : 0.1;
  Mat l = imread(argv[1], 1), r = imread(argv[2], 1);
  if (l.empty() || r.empty()) {
    fprintf(stderr, "cannot read images\n");
    return 1;
  }
  int h = l.rows, w = l.cols;

  int d = 0;
  vector<float> vol;
  string volarg = argv[3];
  if (volarg == "adgrad" || volarg == "census") {
    d = argc > 6 ? atoi(argv[6]) : 60;  // num_disp for computed-cost modes
  } else {
    ifstream vf(volarg.c_str(), ios::binary);
    int32_t dims[3];
    vf.read((char *)dims, 12);
    if (dims[0] != h || dims[1] != w) {
      fprintf(stderr, "volume dims %dx%d != image %dx%d\n", dims[0], dims[1],
              h, w);
      return 1;
    }
    d = dims[2];
    vol.resize((size_t)h * w * d);
    vf.read((char *)vol.data(), vol.size() * 4);
  }

  unsigned char ***left = qx_allocu_3(h, w, 3);
  unsigned char ***right = qx_allocu_3(h, w, 3);
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++)
      for (int c = 0; c < 3; c++) {
        left[y][x][c] = l.ptr<uchar>(y)[x * 3 + c];
        right[y][x][c] = r.ptr<uchar>(y)[x * 3 + c];
      }

  qx_nonlocal_cost_aggregation nlca;
  nlca.init(h, w, d, sigma);
  nlca.m_left = left;
  nlca.m_right = right;
  string volmode = argv[3];
  if (volmode == "adgrad") {
    // the reference's own color+gradient NL cost (cpp:190-218)
    nlca.matching_cost_from_color_and_gradient(left, right);
  } else if (volmode == "census") {
    // the 80-bit 9x9 wraparound census alternative (cpp:110-189)
    nlca.my_matching_cost_from_cencus(left, right);
  } else {
    // inject the raw volume exactly as matching_cost() would leave it
    // (cpp:58-71: vol -> backup copy, right volume via flip)
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        for (int k = 0; k < d; k++)
          nlca.m_cost_vol[y][x][k] = (double)vol[((size_t)y * w + x) * d + k];
  }
  image_copy(nlca.m_cost_vol_backup, nlca.m_cost_vol, h, w, d);
  qx_stereo_flip_corr_vol(nlca.m_cost_vol_right, nlca.m_cost_vol, h, w, d);
  nlca.m_tf.build_tree(left[0][0]);
  nlca.m_tf_right.build_tree(right[0][0]);

  unsigned char **out = qx_allocu(h, w);
  string prefix = argv[4];
  if (volmode == "adgrad" || volmode == "census") {
    // dump the computed raw cost volume for cost-level diffing
    ofstream f(prefix + "_nl_rawvol.bin", ios::binary);
    int32_t dims[3] = {h, w, d};
    f.write((const char *)dims, 12);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        for (int k = 0; k < d; k++) {
          float v = (float)nlca.m_cost_vol_backup[y][x][k];
          f.write((const char *)&v, 4);
        }
  }
  nlca.disparity(out, false);
  dump_u8(out, h, w, prefix + "_nl_nopost.bin");
  nlca.disparity(out, true);  // re-copies from backup; updates m_tf to s/2
  dump_u8(out, h, w, prefix + "_nl_post.bin");

  qx_freeu_3(left);
  qx_freeu_3(right);
  qx_freeu(out);
  printf("{\"h\": %d, \"w\": %d, \"d\": %d, \"sigma\": %g}\n", h, w, d, sigma);
  return 0;
}
