// pjrt_predict: the full C++ predict pipeline — frames in, court JSON out,
// zero Python.
//
// Native analog of the reference's 3-process inference pipeline
// (/root/reference/predict.py:45-122: GPU predict -> GPU->CPU transfer ->
// writer) and of this repo's Python predict CLI
// (sports_field_homography_tpu/cli/predict.py), built on the PJRT C API:
//
//   decode threads (OpenCV imread / VideoCapture, resize, BGR->RGB uint8)
//      -> bounded batch queue
//   main thread: host->device upload + execute (pipelined, async dispatch)
//      -> bounded result queue (backpressure bounds in-flight device work)
//   writer thread: await completion, fetch theta/score/poi, write JSONL
//      -> final {game}_court.json merge (reference predict.py:399-407)
//
// The model artifact is a fixed-batch StableHLO serving export
// (compat/serving.save_serving: module.mlir.bc + compile_options.pb +
// io_spec.txt) with weights, court constants, the interval warp table and
// uint8 normalization baked in.  The io_spec must declare a uint8
// [B,H,W,3] input; outputs named "theta" / "consist_score" / "poi" are
// written to the JSON, and uint8 outputs named "segm_mask" / "warp_mask"
// are written as per-frame PNGs under <dst>/court/{segm,warp}_mask/ with
// the Python CLI's semantics (cli/predict.py _write_outputs; reference
// predict.py:287-315): colorspace per --mask_type (gray = raw labels,
// bin = (label>0)*255, rgb = the class palette), then an unconditional
// nearest resize to --out_size.  Other outputs are computed but dropped
// — export with ``keep`` to prune them at trace time instead.  The
// pickle mask stream stays the Python CLI's job (a Python-specific
// format); PNG covers the full-output production config (BASELINE
// config #2: segm_mask + warp_mask + theta + poi + consistency).
//
// Preprocessing matches the repo's video path (cli/predict.py semantics,
// data/dataset.py:281-285): cv2 INTER_AREA when downscaling else
// INTER_LINEAR, BGR->RGB, uint8 NHWC (the program normalizes /255 on
// device).  The Python img-dir path uses PIL's bicubic instead
// (docs/PARITY.md); at the production 640x360 the theta delta between the
// two resizers is well under the 1e-3 north star on real frames.
//
// Usage:
//   pjrt_predict <artifact_dir> (--img_dir D | --video F) --dst_dir O
//       [--plugin /opt/axon/libaxon_pjrt.so] [--opt key=value ...]
//       [--threads N] [--queue N] [--limit N] [--model NAME] [--time]
//
// For the axon TPU plugin pass the same --opt set as pjrt_serve.cc.
#include <algorithm>
#include <atomic>
#include <cerrno>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <dirent.h>
#include <sys/stat.h>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include "pjrt_common.h"

namespace {

using sfh::Api;
using sfh::AwaitEvent;
using sfh::CheckError;
using sfh::TensorSpec;

// ---- small utilities -------------------------------------------------------

std::string Basename(std::string p) {
  while (!p.empty() && p.back() == '/') p.pop_back();
  size_t s = p.find_last_of('/');
  return s == std::string::npos ? p : p.substr(s + 1);
}

std::string Dirname(std::string p) {
  while (!p.empty() && p.back() == '/') p.pop_back();
  size_t s = p.find_last_of('/');
  return s == std::string::npos ? std::string(".") : p.substr(0, s);
}

std::string Stem(const std::string& filename) {
  size_t d = filename.find_last_of('.');
  return d == std::string::npos ? filename : filename.substr(0, d);
}

bool HasImageExt(const std::string& f) {
  size_t d = f.find_last_of('.');
  if (d == std::string::npos) return false;
  std::string e = f.substr(d + 1);
  std::transform(e.begin(), e.end(), e.begin(), ::tolower);
  return e == "png" || e == "jpg" || e == "jpeg" || e == "bmp";
}

// JSON float formatting: enough digits to round-trip a float32 exactly
// when re-read (the Python CLI emits repr(float(f32)); consumers like
// geometry/court.CourtMapping json.load either way).
std::string JsonFloat(float v) {
  char buf[32];
  snprintf(buf, sizeof buf, "%.9g", (double)v);
  return buf;
}

// The Python CLI rounds the score to 6 decimals: float("{:5f}".format(s))
// (cli/predict.py:371, reference predict.py:350).  Trim trailing zeros the
// way Python's repr of the rounded float does for common cases.
std::string JsonScore(float v) {
  char buf[32];
  snprintf(buf, sizeof buf, "%.6f", (double)v);
  std::string s = buf;
  while (s.size() > 1 && s.back() == '0') s.pop_back();
  if (!s.empty() && s.back() == '.') s.push_back('0');
  return s;
}

// ---- mask postprocessing ---------------------------------------------------

// id -> BGR class palettes (utils/postprocess.py CLASS_PALETTES, reference
// utils/postprocess.py:30-51).  Returns false for unsupported class counts
// (the Python CLI raises NotImplementedError the same way).
bool PaletteFor(int n_classes, cv::Vec3b lut[256]) {
  for (int i = 0; i < 256; ++i) lut[i] = cv::Vec3b(0, 0, 0);
  if (n_classes != 4 && n_classes != 7 && n_classes != 8) return false;
  lut[1] = cv::Vec3b(0, 255, 0);
  lut[2] = cv::Vec3b(255, 0, 0);
  lut[3] = cv::Vec3b(0, 0, 255);
  if (n_classes >= 7) {
    lut[4] = cv::Vec3b(255, 255, 255);
    lut[5] = cv::Vec3b(255, 0, 255);
    lut[6] = cv::Vec3b(0, 255, 255);
  }
  if (n_classes >= 8) lut[7] = cv::Vec3b(255, 255, 0);
  return true;
}

// One label mask -> the saved image, with the Python CLI's exact order:
// colorspace conversion FIRST, then the unconditional nearest resize to
// out_size (cli/predict.py _write_outputs + _resize_masks).
cv::Mat ConvertMask(const uint8_t* labels, int h, int w,
                    const std::string& mask_type, const cv::Vec3b* lut,
                    int out_w, int out_h) {
  cv::Mat src(h, w, CV_8UC1, const_cast<uint8_t*>(labels));
  cv::Mat img;
  if (mask_type == "rgb") {
    img.create(h, w, CV_8UC3);
    for (int r = 0; r < h; ++r) {
      const uint8_t* in = src.ptr<uint8_t>(r);
      cv::Vec3b* out = img.ptr<cv::Vec3b>(r);
      for (int c = 0; c < w; ++c) out[c] = lut[in[c]];
    }
  } else if (mask_type == "bin") {
    cv::threshold(src, img, 0, 255, cv::THRESH_BINARY);
  } else {  // gray: raw label values
    img = src.clone();
  }
  if (img.cols != out_w || img.rows != out_h)
    cv::resize(img, img, cv::Size(out_w, out_h), 0, 0, cv::INTER_NEAREST);
  return img;
}

bool MkdirP(const std::string& path) {
  std::string cur;
  for (size_t i = 0; i <= path.size(); ++i) {
    if (i == path.size() || path[i] == '/') {
      if (!cur.empty() && mkdir(cur.c_str(), 0777) != 0 && errno != EEXIST)
        return false;
    }
    if (i < path.size()) cur.push_back(path[i]);
  }
  return true;
}

// ---- pipeline plumbing -----------------------------------------------------

struct Batch {
  std::vector<uint8_t> data;          // B*H*W*3 uint8 NHWC (tail zero-padded)
  std::vector<std::string> names;     // size n_valid
  int n_valid = 0;
};

struct Result {
  std::vector<PJRT_Buffer*> outputs;  // program order
  PJRT_Buffer* input = nullptr;
  PJRT_Event* done = nullptr;
  std::vector<std::string> names;
  int n_valid = 0;
};

// Bounded MPMC queue with close() semantics (pop returns false when the
// queue is closed and drained) — the backpressure spine of the pipeline,
// mirroring the reference's Queue(5)/Queue(30) maxsizes (predict.py:51-54).
template <typename T>
class BoundedQueue {
 public:
  explicit BoundedQueue(size_t cap) : cap_(cap) {}

  bool push(T item) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_push_.wait(lk, [&] { return q_.size() < cap_ || closed_; });
    if (closed_) return false;
    q_.push_back(std::move(item));
    cv_pop_.notify_one();
    return true;
  }

  bool pop(T* out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_pop_.wait(lk, [&] { return !q_.empty() || closed_; });
    if (q_.empty()) return false;
    *out = std::move(q_.front());
    q_.pop_front();
    cv_push_.notify_one();
    return true;
  }

  void close() {
    std::lock_guard<std::mutex> lk(mu_);
    closed_ = true;
    cv_pop_.notify_all();
    cv_push_.notify_all();
  }

 private:
  std::mutex mu_;
  std::condition_variable cv_push_, cv_pop_;
  std::deque<T> q_;
  size_t cap_;
  bool closed_ = false;
};

std::atomic<bool> g_failed{false};

void Fail(const char* what) {
  fprintf(stderr, "pjrt_predict: %s\n", what);
  g_failed.store(true);
}

// Resize + BGR->RGB into the batch slot.  INTER_AREA on downscale else
// INTER_LINEAR — the repo's video-frame semantics (data/dataset.py:284).
void PreprocessInto(const cv::Mat& bgr, int W, int H, uint8_t* dst) {
  cv::Mat frame = bgr;
  if (frame.cols != W || frame.rows != H) {
    int inter = frame.cols > W ? cv::INTER_AREA : cv::INTER_LINEAR;
    cv::resize(frame, frame, cv::Size(W, H), 0, 0, inter);
  }
  if (frame.channels() == 1) cv::cvtColor(frame, frame, cv::COLOR_GRAY2RGB);
  cv::Mat rgb(H, W, CV_8UC3, dst);
  cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
}

// Image-directory producer: per-batch slot decode fanned out over
// ``threads`` workers (the analog of DataLoader num_workers,
// reference predict.py:219-226), batches pushed in order.
void ProduceFromDir(const std::string& dir,
                    const std::vector<std::string>& files, int B, int H,
                    int W, int threads, BoundedQueue<Batch>* out) {
  size_t n = files.size();
  for (size_t base = 0; base < n && !g_failed.load(); base += B) {
    Batch b;
    int valid = (int)std::min((size_t)B, n - base);
    b.data.assign((size_t)B * H * W * 3, 0);
    b.names.reserve(valid);
    for (int s = 0; s < valid; ++s) b.names.push_back(Stem(files[base + s]));
    b.n_valid = valid;

    int t_count = std::max(1, std::min(threads, valid));
    std::vector<std::thread> pool;
    pool.reserve(t_count);
    std::atomic<int> next{0};
    for (int t = 0; t < t_count; ++t) {
      pool.emplace_back([&] {
        int s;
        while ((s = next.fetch_add(1)) < valid) {
          cv::Mat img = cv::imread(dir + "/" + files[base + s],
                                   cv::IMREAD_COLOR);
          if (img.empty()) {
            Fail(("cannot decode " + files[base + s]).c_str());
            return;
          }
          PreprocessInto(img, W, H, b.data.data() + (size_t)s * H * W * 3);
        }
      });
    }
    for (auto& t : pool) t.join();
    if (g_failed.load()) break;
    if (!out->push(std::move(b))) break;
  }
  out->close();
}

// Video producer: sequential decode (codec state is inherently serial),
// seek-and-retry then black-frame fallback exactly like the datasets
// (data/dataset.py VideoDataset, reference utils/dataset.py:336-345).
void ProduceFromVideo(const std::string& path, int64_t limit, int B, int H,
                      int W, BoundedQueue<Batch>* out) {
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) {
    Fail(("cannot open video " + path).c_str());
    out->close();
    return;
  }
  int64_t n = (int64_t)cap.get(cv::CAP_PROP_FRAME_COUNT);
  if (limit > 0 && limit < n) n = limit;
  if (n <= 0) {
    Fail("video reports no frames");
    out->close();
    return;
  }
  char name[16];
  for (int64_t base = 0; base < n && !g_failed.load(); base += B) {
    Batch b;
    int valid = (int)std::min((int64_t)B, n - base);
    b.data.assign((size_t)B * H * W * 3, 0);
    b.n_valid = valid;
    for (int s = 0; s < valid; ++s) {
      int64_t idx = base + s;
      snprintf(name, sizeof name, "%06lld", (long long)idx);
      b.names.push_back(name);
      cv::Mat frame;
      if (!cap.read(frame) || frame.empty()) {
        cap.set(cv::CAP_PROP_POS_FRAMES, (double)idx);
        if (!cap.read(frame) || frame.empty()) {
          fprintf(stderr,
                  "pjrt_predict: frame %lld unreadable, using black\n",
                  (long long)idx);
          frame = cv::Mat::zeros(H, W, CV_8UC3);
        }
      }
      PreprocessInto(frame, W, H, b.data.data() + (size_t)s * H * W * 3);
    }
    if (!out->push(std::move(b))) break;
  }
  out->close();
}

// Plugin-free self-test of the host-side pipeline pieces (run by
// tests/test_pjrt_predict_cpp.py on any host, TPU or not): JSON
// formatting parity, preprocessing, and queue shutdown semantics —
// including the "producer parked in push while consumer exits" path.
int SelfTest() {
  // JSON formatting
  if (JsonScore(0.1234567f) != "0.123457") return 1;   // 6-decimal round
  if (JsonScore(0.5f) != "0.5") return 2;              // trailing-zero trim
  if (JsonScore(2.0f) != "2.0") return 3;
  if (JsonFloat(0.25f) != "0.25") return 4;
  {  // float32 round-trip through the printed form
    float v = 0.43999999762f;
    if (strtof(JsonFloat(v).c_str(), nullptr) != v) return 5;
  }

  // preprocessing: BGR->RGB swap, identity size
  {
    cv::Mat bgr(2, 2, CV_8UC3, cv::Scalar(10, 20, 30));  // B=10,G=20,R=30
    std::vector<uint8_t> out(2 * 2 * 3);
    PreprocessInto(bgr, 2, 2, out.data());
    if (out[0] != 30 || out[1] != 20 || out[2] != 10) return 6;
  }
  {  // downscale 4x4 -> 2x2 INTER_AREA = 2x2 box mean
    cv::Mat bgr(4, 4, CV_8UC3);
    for (int r = 0; r < 4; ++r)
      for (int c = 0; c < 4; ++c)
        bgr.at<cv::Vec3b>(r, c) = cv::Vec3b(4 * r + c, 0, 0);
    std::vector<uint8_t> out(2 * 2 * 3);
    PreprocessInto(bgr, 2, 2, out.data());
    // top-left box {0,1,4,5} mean = 2.5 -> rounds to 2 or 3 (B channel
    // lands at RGB index 2)
    if (out[2] < 2 || out[2] > 3) return 7;
  }

  // mask conversion: the Python CLI's bin/gray/rgb semantics + the
  // unconditional nearest resize (cli/predict.py _write_outputs)
  {
    cv::Vec3b lut[256];
    if (PaletteFor(3, lut)) return 20;          // unsupported class count
    if (!PaletteFor(4, lut)) return 21;
    uint8_t labels[6] = {0, 1, 2, 3, 0, 1};     // 2x3 label mask
    cv::Mat gray = ConvertMask(labels, 2, 3, "gray", lut, 3, 2);
    if (gray.type() != CV_8UC1 || gray.at<uint8_t>(0, 1) != 1) return 22;
    cv::Mat bin = ConvertMask(labels, 2, 3, "bin", lut, 3, 2);
    if (bin.at<uint8_t>(0, 0) != 0 || bin.at<uint8_t>(0, 1) != 255 ||
        bin.at<uint8_t>(1, 1) != 0) return 23;
    cv::Mat rgb = ConvertMask(labels, 2, 3, "rgb", lut, 3, 2);
    if (rgb.type() != CV_8UC3) return 24;
    if (rgb.at<cv::Vec3b>(0, 1) != cv::Vec3b(0, 255, 0)) return 25;   // BGR
    if (rgb.at<cv::Vec3b>(0, 2) != cv::Vec3b(255, 0, 0)) return 26;
    if (rgb.at<cv::Vec3b>(1, 0) != cv::Vec3b(0, 0, 255)) return 26;
    if (rgb.at<cv::Vec3b>(0, 0) != cv::Vec3b(0, 0, 0)) return 27;
    // 2x nearest upscale replicates labels exactly
    cv::Mat up = ConvertMask(labels, 2, 3, "gray", lut, 6, 4);
    if (up.cols != 6 || up.rows != 4 || up.at<uint8_t>(0, 2) != 1 ||
        up.at<uint8_t>(0, 3) != 1) return 28;
  }

  // queue: FIFO order + close-drains
  {
    BoundedQueue<int> q(2);
    q.push(1);
    q.push(2);
    q.close();
    int v = 0;
    if (!q.pop(&v) || v != 1) return 8;   // close still drains queued items
    if (!q.pop(&v) || v != 2) return 9;
    if (q.pop(&v)) return 10;             // closed + drained -> false
    if (q.push(3)) return 11;             // push after close -> false
  }
  // close() must unblock a producer parked in push (the pipeline's
  // error-shutdown path; a missed close here deadlocked an early draft)
  {
    BoundedQueue<int> q(1);
    q.push(1);  // full
    std::atomic<int> pushed{-1};
    std::thread producer([&] { pushed.store(q.push(2) ? 1 : 0); });
    std::this_thread::sleep_for(std::chrono::milliseconds(50));
    q.close();
    producer.join();
    if (pushed.load() != 0) return 12;  // blocked push must resolve false
  }

  fprintf(stderr, "pjrt_predict: selftest OK\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc == 2 && std::string(argv[1]) == "--selftest") {
    int rc = SelfTest();
    if (rc != 0) fprintf(stderr, "pjrt_predict: selftest FAILED (%d)\n", rc);
    return rc;
  }
  std::string artifact, img_dir, video, dst_dir, model_name;
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  std::string mask_type = "gray";     // Python CLI default (utils/config.py)
  int out_w = 1280, out_h = 720;      // --out_size default, like the CLI
  int mask_classes = 4;
  std::vector<std::pair<std::string, std::string>> raw_opts;
  int threads = 4, queue_depth = 3;
  int64_t limit = 0;
  bool time_exec = false;
  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto val = [&](const char* flag) -> const char* {
      if (i + 1 >= argc) {
        fprintf(stderr, "pjrt_predict: %s expects a value\n", flag);
        exit(2);
      }
      return argv[++i];
    };
    if (a == "--plugin") plugin = val("--plugin");
    else if (a == "--img_dir") img_dir = val("--img_dir");
    else if (a == "--video") video = val("--video");
    else if (a == "--dst_dir") dst_dir = val("--dst_dir");
    else if (a == "--model") model_name = val("--model");
    else if (a == "--threads") threads = atoi(val("--threads"));
    else if (a == "--queue") queue_depth = atoi(val("--queue"));
    else if (a == "--limit") limit = atoll(val("--limit"));
    else if (a == "--mask_type") mask_type = val("--mask_type");
    else if (a == "--mask_classes") mask_classes = atoi(val("--mask_classes"));
    else if (a == "--out_size") {
      std::string wh = val("--out_size");
      size_t x = wh.find_first_of("x,");
      if (x == std::string::npos || sscanf(wh.c_str(), "%d", &out_w) != 1 ||
          sscanf(wh.c_str() + x + 1, "%d", &out_h) != 1 ||
          out_w <= 0 || out_h <= 0) {
        fprintf(stderr, "pjrt_predict: --out_size expects WxH\n");
        return 2;
      }
    }
    else if (a == "--time") time_exec = true;
    else if (a == "--opt") {
      std::string kv = val("--opt");
      size_t eq = kv.find('=');
      if (eq == std::string::npos) {
        fprintf(stderr, "pjrt_predict: --opt expects key=value\n");
        return 2;
      }
      raw_opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else {
      pos.push_back(a);
    }
  }
  if (pos.size() != 1 || dst_dir.empty() ||
      (img_dir.empty() == video.empty())) {
    fprintf(stderr,
            "usage: pjrt_predict <artifact_dir> (--img_dir D | --video F) "
            "--dst_dir O [--plugin so] [--opt k=v ...] [--threads N] "
            "[--queue N] [--limit N] [--model NAME] [--time] "
            "[--mask_type bin|gray|rgb] [--out_size WxH] [--mask_classes N]"
            "\n");
    return 2;
  }
  artifact = pos[0];
  if (threads < 1) threads = 1;
  if (queue_depth < 1) queue_depth = 1;
  if (model_name.empty()) model_name = Basename(artifact);
  mkdir(dst_dir.c_str(), 0777);  // EEXIST is fine; writes fail loudly below

  // ---- artifact ------------------------------------------------------------
  std::string module_bc, compile_options, io_spec_text;
  if (!sfh::ReadFile(artifact + "/module.mlir.bc", &module_bc) ||
      !sfh::ReadFile(artifact + "/compile_options.pb", &compile_options) ||
      !sfh::ReadFile(artifact + "/io_spec.txt", &io_spec_text))
    return 1;
  TensorSpec input;
  std::vector<TensorSpec> outputs;
  if (!sfh::ParseIoSpec(io_spec_text, &input, &outputs)) return 1;
  if (input.dtype != "uint8" || input.dims.size() != 4 ||
      input.dims[3] != 3) {
    fprintf(stderr,
            "pjrt_predict: artifact input must be uint8 [B,H,W,3], got %s "
            "rank %zu (export with input_dtype='uint8')\n",
            input.dtype.c_str(), input.dims.size());
    return 1;
  }
  const int B = (int)input.dims[0], H = (int)input.dims[1],
            W = (int)input.dims[2];
  int theta_idx = -1, score_idx = -1, poi_idx = -1;
  int segm_idx = -1, warp_idx = -1;
  for (size_t i = 0; i < outputs.size(); ++i) {
    if (outputs[i].name == "theta") theta_idx = (int)i;
    else if (outputs[i].name == "consist_score") score_idx = (int)i;
    else if (outputs[i].name == "poi") poi_idx = (int)i;
    else if (outputs[i].name == "segm_mask") segm_idx = (int)i;
    else if (outputs[i].name == "warp_mask") warp_idx = (int)i;
  }
  if (theta_idx < 0 && score_idx < 0 && poi_idx < 0 && segm_idx < 0 &&
      warp_idx < 0) {
    fprintf(stderr,
            "pjrt_predict: artifact has none of theta/consist_score/poi/"
            "segm_mask/warp_mask outputs — nothing to write\n");
    return 1;
  }
  for (int idx : {theta_idx, score_idx, poi_idx})
    if (idx >= 0 && outputs[idx].dtype != "float32") {
      fprintf(stderr, "pjrt_predict: output %s must be float32, got %s\n",
              outputs[idx].name.c_str(), outputs[idx].dtype.c_str());
      return 1;
    }
  for (int idx : {segm_idx, warp_idx})
    if (idx >= 0 && (outputs[idx].dtype != "uint8" ||
                     outputs[idx].dims.size() != 3)) {
      fprintf(stderr,
              "pjrt_predict: output %s must be uint8 [B,h,w] (the exported "
              "device-side label masks), got %s rank %zu\n",
              outputs[idx].name.c_str(), outputs[idx].dtype.c_str(),
              outputs[idx].dims.size());
      return 1;
    }
  cv::Vec3b palette[256];
  if ((segm_idx >= 0 || warp_idx >= 0) && mask_type == "rgb" &&
      !PaletteFor(mask_classes, palette)) {
    fprintf(stderr, "pjrt_predict: no rgb palette for %d classes "
                    "(supported: 4/7/8)\n", mask_classes);
    return 1;
  }
  if (mask_type != "gray" && mask_type != "bin" && mask_type != "rgb") {
    fprintf(stderr, "pjrt_predict: --mask_type must be bin|gray|rgb\n");
    return 1;
  }

  // ---- frame source --------------------------------------------------------
  std::string game_name;
  std::vector<std::string> files;
  if (!img_dir.empty()) {
    game_name = Basename(img_dir);
    // sorted listing, like the Python dataset's sorted ids
    DIR* d = opendir(img_dir.c_str());
    if (d == nullptr) {
      fprintf(stderr, "pjrt_predict: cannot list %s\n", img_dir.c_str());
      return 1;
    }
    for (dirent* e = readdir(d); e != nullptr; e = readdir(d)) {
      std::string f = e->d_name;
      if (HasImageExt(f)) files.push_back(f);
    }
    closedir(d);
    std::sort(files.begin(), files.end());
    if (limit > 0 && (int64_t)files.size() > limit) files.resize(limit);
    if (files.empty()) {
      fprintf(stderr, "pjrt_predict: no images in %s\n", img_dir.c_str());
      return 1;
    }
    fprintf(stderr, "pjrt_predict: %zu frames from %s\n", files.size(),
            img_dir.c_str());
  } else {
    game_name = Basename(Dirname(video));
  }

  // ---- plugin / client / compile -------------------------------------------
  if (!sfh::LoadPlugin(plugin)) return 1;
  std::vector<std::string> opt_storage;
  PJRT_Client* client = sfh::CreateClient(raw_opts, &opt_storage);
  if (client == nullptr) return 1;
  PJRT_Device* device = sfh::FirstDevice(client);
  if (device == nullptr) return 1;
  auto t0 = std::chrono::steady_clock::now();
  PJRT_LoadedExecutable* exec = sfh::Compile(client, module_bc,
                                             compile_options);
  if (exec == nullptr) return 1;
  auto t1 = std::chrono::steady_clock::now();
  fprintf(stderr, "pjrt_predict: compiled in %.1f s (batch %d, %dx%d)\n",
          std::chrono::duration<double>(t1 - t0).count(), B, W, H);
  {
    size_t n = 0;
    if (!sfh::NumProgramOutputs(exec, &n)) return 1;
    if (n != outputs.size()) {
      fprintf(stderr,
              "pjrt_predict: io_spec.txt lists %zu outputs but the program "
              "produces %zu — stale artifact?\n",
              outputs.size(), n);
      return 1;
    }
  }

  // ---- pipeline ------------------------------------------------------------
  BoundedQueue<Batch> batches(queue_depth);
  BoundedQueue<Result> results(queue_depth);

  std::thread producer(
      !img_dir.empty()
          ? std::thread([&] {
              ProduceFromDir(img_dir, files, B, H, W, threads, &batches);
            })
          : std::thread([&] {
              ProduceFromVideo(video, limit, B, H, W, &batches);
            }));

  // JSONL while processing, merged at the end — the reference's crash-
  // friendly two-phase write (predict.py:343-357,399-407)
  std::string jsonl_path =
      dst_dir + "/" + game_name + "_court_processing.json";
  std::ofstream jsonl(jsonl_path);
  if (!jsonl) {
    fprintf(stderr, "pjrt_predict: cannot write %s\n", jsonl_path.c_str());
    batches.close();
    producer.join();
    return 1;
  }

  // mask output dirs (Python save_mask_as_png postfixes, cli/predict.py)
  std::string segm_dir = dst_dir + "/court/segm_mask";
  std::string warp_dir = dst_dir + "/court/warp_mask";
  if ((segm_idx >= 0 && !MkdirP(segm_dir)) ||
      (warp_idx >= 0 && !MkdirP(warp_dir))) {
    fprintf(stderr, "pjrt_predict: cannot create mask dirs under %s\n",
            dst_dir.c_str());
    batches.close();
    producer.join();
    return 1;
  }

  std::atomic<int64_t> frames_done{0};
  double wait_ms = 0.0;  // writer time blocked on the device
  std::vector<std::pair<std::string, std::string>> entries;  // name -> json

  std::thread writer([&] {
    Result r;
    std::vector<char> theta_host, score_host, poi_host;
    std::vector<char> segm_host, warp_host;
    while (results.pop(&r)) {
      auto w0 = std::chrono::steady_clock::now();
      bool ok = AwaitEvent(r.done, "execution");
      auto w1 = std::chrono::steady_clock::now();
      wait_ms += std::chrono::duration<double, std::milli>(w1 - w0).count();
      if (ok && theta_idx >= 0)
        ok = sfh::FetchBuffer(r.outputs[theta_idx], &theta_host);
      if (ok && score_idx >= 0)
        ok = sfh::FetchBuffer(r.outputs[score_idx], &score_host);
      if (ok && poi_idx >= 0)
        ok = sfh::FetchBuffer(r.outputs[poi_idx], &poi_host);
      if (ok && segm_idx >= 0)
        ok = sfh::FetchBuffer(r.outputs[segm_idx], &segm_host);
      if (ok && warp_idx >= 0)
        ok = sfh::FetchBuffer(r.outputs[warp_idx], &warp_host);
      for (PJRT_Buffer* b : r.outputs)
        sfh::DestroyBuffer(b, "Buffer_Destroy(output)");
      sfh::DestroyBuffer(r.input, "Buffer_Destroy(input)");
      if (!ok) {
        Fail("device round failed");
        results.close();
        break;
      }
      const float* theta = theta_idx >= 0
          ? reinterpret_cast<const float*>(theta_host.data()) : nullptr;
      const float* score = score_idx >= 0
          ? reinterpret_cast<const float*>(score_host.data()) : nullptr;
      const float* poi = poi_idx >= 0
          ? reinterpret_cast<const float*>(poi_host.data()) : nullptr;
      int64_t theta_per = theta_idx >= 0
          ? sfh::NumElements(outputs[theta_idx].dims) / B : 0;
      int64_t poi_per = poi_idx >= 0
          ? sfh::NumElements(outputs[poi_idx].dims) / B : 0;
      for (int s = 0; s < r.n_valid && !g_failed.load(); ++s) {
        // mask PNGs (reference predict.py:287-315 semantics; see header)
        for (auto& m : {std::make_tuple(segm_idx, &segm_host, &segm_dir),
                        std::make_tuple(warp_idx, &warp_host, &warp_dir)}) {
          int idx = std::get<0>(m);
          if (idx < 0) continue;
          int mh = (int)outputs[idx].dims[1], mw = (int)outputs[idx].dims[2];
          const uint8_t* labels = reinterpret_cast<const uint8_t*>(
              std::get<1>(m)->data()) + (size_t)s * mh * mw;
          cv::Mat img = ConvertMask(labels, mh, mw, mask_type, palette,
                                    out_w, out_h);
          std::string path = *std::get<2>(m) + "/" + r.names[s] + ".png";
          if (!cv::imwrite(path, img)) {
            Fail(("cannot write " + path).c_str());
            results.close();
            break;
          }
        }
        if (g_failed.load()) break;
        // mask-only artifact: no JSON record for the frame (the Python CLI
        // appends json_records only when theta/score/poi are requested)
        if (theta == nullptr && score == nullptr && poi == nullptr) continue;
        std::ostringstream e;
        e << "{";
        bool first = true;
        if (score != nullptr) {
          e << "\"score\": " << JsonScore(score[s]);
          first = false;
        }
        if (theta != nullptr) {
          // theta is [B,1,3,3] like the Python CLI's preds["theta"][i]
          if (!first) e << ", ";
          e << "\"theta\": [[";
          const float* t = theta + s * theta_per;
          for (int row = 0; row < 3; ++row) {
            e << (row ? ", [" : "[");
            for (int col = 0; col < 3; ++col)
              e << (col ? ", " : "") << JsonFloat(t[row * 3 + col]);
            e << "]";
          }
          e << "]]";
          first = false;
        }
        if (poi != nullptr) {
          if (!first) e << ", ";
          e << "\"poi\": [";
          const float* p = poi + s * poi_per;
          for (int64_t k = 0; k < poi_per / 2; ++k) {
            e << (k ? ", [" : "[") << JsonFloat(p[2 * k]) << ", "
              << JsonFloat(p[2 * k + 1]) << "]";
          }
          e << "]";
        }
        e << "}";
        jsonl << "{\"" << r.names[s] << "\": " << e.str() << "}\n";
        entries.emplace_back(r.names[s], e.str());
      }
      jsonl.flush();
      frames_done += r.n_valid;
    }
  });

  auto tp0 = std::chrono::steady_clock::now();
  PJRT_ExecuteOptions eo;
  memset(&eo, 0, sizeof eo);
  eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  Batch b;
  bool exec_ok = true;
  while (exec_ok && batches.pop(&b)) {
    PJRT_Buffer* in_buf = sfh::UploadBuffer(client, device, b.data.data(),
                                            PJRT_Buffer_Type_U8, input.dims);
    if (in_buf == nullptr) {
      exec_ok = false;
      break;
    }
    Result r;
    r.outputs.assign(outputs.size(), nullptr);
    r.input = in_buf;
    r.names = std::move(b.names);
    r.n_valid = b.n_valid;
    PJRT_Buffer** out_list = r.outputs.data();
    PJRT_Buffer* const arg_list[] = {in_buf};
    PJRT_Buffer* const* const arg_lists[] = {arg_list};
    PJRT_LoadedExecutable_Execute_Args ex;
    memset(&ex, 0, sizeof ex);
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &eo;
    ex.argument_lists = arg_lists;
    ex.num_devices = 1;
    ex.num_args = 1;
    ex.output_lists = &out_list;
    ex.device_complete_events = &r.done;
    if (!CheckError(Api()->PJRT_LoadedExecutable_Execute(&ex), "Execute")) {
      sfh::DestroyBuffer(in_buf, "Buffer_Destroy(input)");
      exec_ok = false;
      break;
    }
    if (!results.push(std::move(r))) break;  // writer failed and closed it
  }
  if (!exec_ok) g_failed.store(true);
  // unblock the producer in every exit path (normal drain, execute error,
  // writer error) — it may be parked in batches.push
  batches.close();
  results.close();
  producer.join();
  writer.join();
  jsonl.close();
  auto tp1 = std::chrono::steady_clock::now();

  if (g_failed.load()) {
    fprintf(stderr, "pjrt_predict: FAILED after %lld frames\n",
            (long long)frames_done.load());
    return 1;
  }

  // ---- merge JSONL -> {game}_court.json ------------------------------------
  std::string court_path = dst_dir + "/" + game_name + "_court.json";
  {
    std::ofstream f(court_path);
    f << "{\n";
    for (auto& kv : entries)
      f << "  \"" << kv.first << "\": " << kv.second << ",\n";
    f << "  \"model\": \"" << model_name << "\"\n}\n";
    if (!f) {
      fprintf(stderr, "pjrt_predict: cannot write %s\n", court_path.c_str());
      return 1;
    }
  }
  remove(jsonl_path.c_str());

  double secs = std::chrono::duration<double>(tp1 - tp0).count();
  int64_t n_done = frames_done.load();
  fprintf(stderr,
          "pjrt_predict: %lld frames in %.2f s (%.1f fps), device wait "
          "%.0f ms -> %s\n",
          (long long)n_done, secs, n_done / std::max(secs, 1e-9), wait_ms,
          court_path.c_str());
  if (time_exec)
    printf("%.2f\n", n_done / std::max(secs, 1e-9));

  PJRT_LoadedExecutable_Destroy_Args ed;
  memset(&ed, 0, sizeof ed);
  ed.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ed.executable = exec;
  CheckError(Api()->PJRT_LoadedExecutable_Destroy(&ed), "Executable_Destroy");
  PJRT_Client_Destroy_Args cd;
  memset(&cd, 0, sizeof cd);
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  CheckError(Api()->PJRT_Client_Destroy(&cd), "Client_Destroy");
  return 0;
}
