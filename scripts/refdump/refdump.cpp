// refdump — golden-dump harness that runs the ACTUAL reference CPU code.
//
// Links the reference's unmodified CPU-path stage files from /root/reference
// (src/CVC.cpp, src/fastguidedfilter.cpp, src/DispSel.cpp, src/PP.cpp +
// include/JointWMF.h) and drives them in the exact order DispEst uses on the
// golden STEREO_GIF float path (reference: src/DispEst.cpp:199-344,
// src/StereoMatch.cpp:193-252), then dumps per-stage tensors and the
// reference's own %BP metrics (src/StereoMatch.cpp:275-311) so the TPU
// rebuild's regression tests compare against reference-binary truth instead
// of a reimplemented oracle.
//
// This file is harness-only code written for the rebuild; the reference
// sources are compiled from the read-only tree, never copied.
//
// Usage:
//   refdump <left> <right> <gt> <occl|-> <disc|-> <out_prefix>
//           <maxDis> <scale> <subsample> <dump_slices 0|1>
//
// Outputs (NumPy .npy v1.0):
//   <p>_lgrdx.npy / _rgrdx.npy        float32 HxW   post-CVC::preprocess
//   <p>_cvc_l_d{D}.npy (if dump)      float32 HxW   cost slices post-CVC
//   <p>_cvf_l_d{D}.npy (if dump)      float32 HxW   cost slices post-FGF
//   <p>_ldisp_wta.npy / _rdisp_wta    uint8   HxW   post-WTA, pre-PP
//   <p>_ldisp_pp.npy  / _rdisp_pp     uint8   HxW   post-JointWMF (final)
//   <p>_metrics.json                                %BP/avgErr, all 3 masks

#include <climits>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "CVC.h"
#include "DispSel.h"
#include "PP.h"
#include "fastguidedfilter.h"

static void write_npy(const std::string& path, const cv::Mat& m) {
  CV_Assert(m.isContinuous() && m.channels() == 1);
  const char* descr = nullptr;
  size_t esz = 0;
  switch (m.depth()) {
    case CV_8U:  descr = "|u1"; esz = 1; break;
    case CV_32F: descr = "<f4"; esz = 4; break;
    default: fprintf(stderr, "unsupported depth\n"); exit(1);
  }
  char dict[256];
  snprintf(dict, sizeof dict,
           "{'descr': '%s', 'fortran_order': False, 'shape': (%d, %d), }",
           descr, m.rows, m.cols);
  std::string header(dict);
  size_t total = 10 + header.size() + 1;          // magic+ver+len + dict + \n
  size_t pad = (64 - total % 64) % 64;
  header += std::string(pad, ' ');
  header += '\n';
  uint16_t hlen = (uint16_t)header.size();
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
  fwrite("\x93NUMPY\x01\x00", 1, 8, f);
  fwrite(&hlen, 2, 1, f);
  fwrite(header.data(), 1, header.size(), f);
  fwrite(m.data, esz, (size_t)m.rows * m.cols, f);
  fclose(f);
}

struct Metrics { float pbp, avg_err; };

// Reference GT evaluation, verbatim semantics (src/StereoMatch.cpp:275-311).
static Metrics eval_bp(const cv::Mat& lDispMap8, const cv::Mat& gtFrame,
                       const cv::Mat& mask, int maxDis, int error_threshold) {
  cv::Mat e;
  cv::absdiff(lDispMap8, gtFrame, e);
  e(cv::Rect(0, 0, maxDis + 1, e.rows)).setTo(cv::Scalar(0));
  cv::threshold(e, e, error_threshold * (CHAR_MAX / maxDis), 255,
                cv::THRESH_TOZERO);
  if (!mask.empty()) e = e.mul(mask, 1 / 255.f);
  Metrics m;
  m.avg_err = (float)(cv::mean(e)[0] / (CHAR_MAX / maxDis));
  unsigned bad = (unsigned)cv::countNonZero(e);
  float num_pixels = (float)(gtFrame.cols * gtFrame.rows);
  m.pbp = bad * 100 / num_pixels;
  return m;
}

int main(int argc, char** argv) {
  if (argc != 11) {
    fprintf(stderr, "usage: %s left right gt occl disc out_prefix maxDis "
                    "scale subsample dump_slices\n", argv[0]);
    return 2;
  }
  std::string fl = argv[1], fr = argv[2], fgt = argv[3], foccl = argv[4],
              fdisc = argv[5], prefix = argv[6];
  int maxDis = atoi(argv[7]);
  int scale_factor = atoi(argv[8]);
  int subsample_rate = atoi(argv[9]);
  bool dump_slices = atoi(argv[10]) != 0;
  const int error_threshold = 4;  // src/StereoMatch.cpp:37

  cv::Mat lFrame = cv::imread(fl, cv::IMREAD_COLOR);
  cv::Mat rFrame = cv::imread(fr, cv::IMREAD_COLOR);
  cv::Mat gtFrame = cv::imread(fgt, cv::IMREAD_GRAYSCALE);
  if (lFrame.empty() || rFrame.empty() || gtFrame.empty()) {
    fprintf(stderr, "failed to read inputs\n");
    return 1;
  }
  // src/StereoMatch.cpp:193-197
  cv::Mat lImg, rImg;
  lFrame.convertTo(lImg, CV_32F, 1 / 255.0f);
  rFrame.convertTo(rImg, CV_32F, 1 / 255.0f);
  int hei = lImg.rows, wid = lImg.cols;

  // --- CVC (src/DispEst.cpp:199-220) ---------------------------------------
  CVC cvc;
  cv::Mat lGrdX, rGrdX;
  cvc.preprocess(lImg, lGrdX);
  cvc.preprocess(rImg, rGrdX);
  std::vector<cv::Mat> lcv(maxDis), rcv(maxDis);
  for (int d = 0; d < maxDis; ++d) {
    lcv[d] = cv::Mat::zeros(hei, wid, CV_32FC1);
    rcv[d] = cv::Mat::zeros(hei, wid, CV_32FC1);
  }
  for (int d = 0; d < maxDis; ++d)
    cvc.buildCV_left(lImg, rImg, lGrdX, rGrdX, d, lcv[d]);
  for (int d = 0; d < maxDis; ++d)
    cvc.buildCV_right(rImg, lImg, rGrdX, lGrdX, d, rcv[d]);  // swapped args as in DispEst.cpp:217

  write_npy(prefix + "_lgrdx.npy", lGrdX);
  write_npy(prefix + "_rgrdx.npy", rGrdX);
  std::vector<int> probe = {1, 8, maxDis / 2, maxDis - 1};
  if (dump_slices)
    for (int d : probe) {
      write_npy(prefix + "_cvc_l_d" + std::to_string(d) + ".npy", lcv[d]);
      write_npy(prefix + "_cvc_r_d" + std::to_string(d) + ".npy", rcv[d]);
    }

  // --- CVF = FastGuidedFilter (src/DispEst.cpp:281-295) --------------------
  {
    FastGuidedFilter fgf_left(lImg, GIF_R_WIN, GIF_EPS, subsample_rate);
    FastGuidedFilter fgf_right(rImg, GIF_R_WIN, GIF_EPS, subsample_rate);
    for (int d = 0; d < maxDis; ++d) lcv[d] = fgf_left.filter(lcv[d]);
    for (int d = 0; d < maxDis; ++d) rcv[d] = fgf_right.filter(rcv[d]);
  }
  if (dump_slices)
    for (int d : probe) {
      write_npy(prefix + "_cvf_l_d" + std::to_string(d) + ".npy", lcv[d]);
      write_npy(prefix + "_cvf_r_d" + std::to_string(d) + ".npy", rcv[d]);
    }

  // --- DispSel (src/DispEst.cpp:311-321) -----------------------------------
  DispSel sel;
  cv::Mat lDisMap = cv::Mat::zeros(hei, wid, CV_8UC1);
  cv::Mat rDisMap = cv::Mat::zeros(hei, wid, CV_8UC1);
  sel.CVSelect(lcv.data(), maxDis, lDisMap);
  sel.CVSelect(rcv.data(), maxDis, rDisMap);
  write_npy(prefix + "_ldisp_wta.npy", lDisMap);
  write_npy(prefix + "_rdisp_wta.npy", rDisMap);

  // --- PP = JointWMF (src/DispEst.cpp:330-336, src/PP.cpp:402-425) ---------
  PP pp;
  cv::Mat lValid = cv::Mat::zeros(hei, wid, CV_8UC1);
  cv::Mat rValid = cv::Mat::zeros(hei, wid, CV_8UC1);
  pp.processDM(lImg, rImg, lDisMap, rDisMap, lValid, rValid, maxDis, 8);
  write_npy(prefix + "_ldisp_pp.npy", lDisMap);
  write_npy(prefix + "_rdisp_pp.npy", rDisMap);

  // --- GT eval (src/StereoMatch.cpp:248-252, 275-311) ----------------------
  cv::Mat lDispMap8;
  lDisMap.convertTo(lDispMap8, CV_8U, scale_factor);

  cv::Mat none;
  Metrics m_none = eval_bp(lDispMap8, gtFrame, none, maxDis, error_threshold);
  FILE* j = fopen((prefix + "_metrics.json").c_str(), "w");
  fprintf(j, "{\n  \"maxDis\": %d, \"scale\": %d, \"subsample\": %d,\n",
          maxDis, scale_factor, subsample_rate);
  fprintf(j, "  \"none\": {\"pbp\": %.6f, \"avg_err\": %.6f}", m_none.pbp,
          m_none.avg_err);
  if (foccl != "-") {
    cv::Mat occl = cv::imread(foccl, cv::IMREAD_GRAYSCALE);
    Metrics m = eval_bp(lDispMap8, gtFrame, occl, maxDis, error_threshold);
    fprintf(j, ",\n  \"nonocc\": {\"pbp\": %.6f, \"avg_err\": %.6f}", m.pbp,
            m.avg_err);
  }
  if (fdisc != "-") {
    cv::Mat disc = cv::imread(fdisc, cv::IMREAD_GRAYSCALE);
    cv::threshold(disc, disc, 254, 255, cv::THRESH_TOZERO);  // :291
    Metrics m = eval_bp(lDispMap8, gtFrame, disc, maxDis, error_threshold);
    fprintf(j, ",\n  \"disc\": {\"pbp\": %.6f, \"avg_err\": %.6f}", m.pbp,
            m.avg_err);
  }
  fprintf(j, "\n}\n");
  fclose(j);
  printf("%s: none %.2f%%\n", prefix.c_str(), m_none.pbp);
  return 0;
}
