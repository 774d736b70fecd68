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
// are written under <dst>/court/{segm,warp}_mask/ with the Python CLI's
// semantics (cli/predict.py _write_outputs; reference predict.py:287-315):
// colorspace per --mask_type (gray = raw labels, bin = (label>0)*255,
// rgb = the class palette), then an unconditional nearest resize to
// --out_size, saved per --mask_save_format as per-frame PNGs (default
// here) or as the Python-compatible pickled PNG-buffer stream data.pkl
// (the Python CLI's default; viz_preds.py's MaskReader input).  --debug
// renders the Python CLI's debug frames (mask overlay on the original
// image + PoI circles + score) to <dst>/court/debug/*.jpeg.  Other
// outputs are computed but dropped — export with ``keep`` to prune them
// at trace time instead.  PNG/pickle+debug cover the full-output
// production config (BASELINE config #2: segm_mask + warp_mask + theta
// + poi + consistency + debug).
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
#include <cmath>
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
#include <unordered_map>
#include <unordered_set>
#include <dirent.h>
#include <sys/stat.h>
#include <unistd.h>
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

void Fail(const char* what);  // defined with the pipeline plumbing below

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

// 50/50 blend of a colored mask over a frame; pixels where the mask is
// pure black keep the frame (utils/postprocess.py overlay; observable
// behavior of reference utils/postprocess.py:60-65).
void OverlayInto(cv::Mat* frame, const cv::Mat& mask) {
  for (int r = 0; r < frame->rows; ++r) {
    cv::Vec3b* f = frame->ptr<cv::Vec3b>(r);
    const cv::Vec3b* m = mask.ptr<cv::Vec3b>(r);
    for (int c = 0; c < frame->cols; ++c) {
      if (m[c] == cv::Vec3b(0, 0, 0)) continue;
      for (int k = 0; k < 3; ++k)
        f[c][k] = (uint8_t)(0.5f * f[c][k] + 0.5f * m[c][k]);
    }
  }
}

// The Python CLI's debug render (cli/predict.py _write_debug; reference
// predict.py:359-394): overlay the warp (preferred) or segm mask on the
// ORIGINAL frame, draw normalized-PoI circles + indices, stamp the
// consistency score, save court/debug/<name>.jpeg at quality 90.  The
// mask arrives as the already-converted+resized image the PNG writer
// saved (the Python debug path consumes exactly those), and non-rgb
// mask types get the palette applied on top (so `bin` masks paint
// nothing: 255 maps to black — faithful to the Python lut semantics).
void RenderDebug(cv::Mat frame, const cv::Mat* mask_img,
                 const std::string& mask_type, const cv::Vec3b* lut,
                 const float* poi, int64_t n_poi, const float* score,
                 const std::string& path) {
  if (mask_img != nullptr) {
    cv::Mat mask = *mask_img;
    if (mask.cols != frame.cols || mask.rows != frame.rows)
      cv::resize(mask, mask, cv::Size(frame.cols, frame.rows), 0, 0,
                 cv::INTER_NEAREST);
    if (mask_type != "rgb") {
      // onehot_to_image on the gray/bin values (single-channel -> palette)
      cv::Mat colored(mask.rows, mask.cols, CV_8UC3);
      for (int r = 0; r < mask.rows; ++r) {
        const uint8_t* in = mask.ptr<uint8_t>(r);
        cv::Vec3b* out = colored.ptr<cv::Vec3b>(r);
        for (int c = 0; c < mask.cols; ++c) out[c] = lut[in[c]];
      }
      mask = colored;
    }
    OverlayInto(&frame, mask);
  }
  if (poi != nullptr) {
    int w = frame.cols, h = frame.rows;
    for (int64_t k = 0; k < n_poi; ++k) {
      float px = poi[2 * k], py = poi[2 * k + 1];
      // normalized coords checked against pixel dims — the (preserved)
      // effective behavior filters only negative coordinates
      if (px < 0 || px >= w || py < 0 || py >= h) continue;
      int x = (int)lrintf(px * w), y = (int)lrintf(py * h);
      cv::circle(frame, cv::Point(x, y), 3, cv::Scalar(255, 255, 255), 2);
      cv::putText(frame, std::to_string(k), cv::Point(x + 3, y + 3),
                  cv::FONT_HERSHEY_COMPLEX_SMALL, 1.0,
                  cv::Scalar(128, 128, 255), 1);
    }
  }
  if (score != nullptr) {
    char txt[32];
    snprintf(txt, sizeof txt, "%4f", *score);
    cv::putText(frame, txt, cv::Point(15, 15),
                cv::FONT_HERSHEY_COMPLEX_SMALL, 0.75, cv::Scalar(0, 255, 0),
                1);
  }
  if (!cv::imwrite(path, frame, {cv::IMWRITE_JPEG_QUALITY, 90}))
    Fail(("cannot write " + path).c_str());
}

// ---- pickle mask stream -----------------------------------------------------
//
// The Python CLI's default mask sink is a pickled PNG-buffer stream:
// sequential pickle.dump([name, png_buffer_ndarray]) records appended to
// <dst>/court/{segm,warp}_mask/data.pkl (cli/predict.py PickleMaskWriter;
// reference predict.py:26-37), consumed by viz_preds.py's MaskReader.
// Each record here is a hand-assembled pickle protocol-3 byte template
// whose payload is the 1-D uint8 numpy array cv2.imencode returns —
// loadable by any Python pickle.load (numpy keeps the
// numpy.core.multiarray._reconstruct entry point importable for exactly
// this pickle-compat purpose).

void PutU32(std::string* out, uint32_t v) {
  char b[4] = {(char)(v & 0xff), (char)((v >> 8) & 0xff),
               (char)((v >> 16) & 0xff), (char)((v >> 24) & 0xff)};
  out->append(b, 4);
}

// Fixed opcode runs of the record template (between the variable-length
// name / array-size / data fields).  Lengths are explicit: the runs
// embed NUL bytes.
// (adjacent literals keep hex escapes from swallowing following hex-digit
// characters — C++ hex escapes are maximal-munch within one literal)
const char kPkHead[] = "\x80\x03](X";  // PROTO 3, EMPTY_LIST, MARK, BINUNICODE
const size_t kPkHeadLen = sizeof(kPkHead) - 1;
// _reconstruct(ndarray, (0,), b'b') REDUCEd, then MARK + state version 1
// + BININT shape elem
const char kPkMid1[] =
    "cnumpy.core.multiarray\n_reconstruct\n"
    "cnumpy\nndarray\n"
    "K\x00\x85"
    "C\x01" "b\x87R"
    "(K\x01J";
const size_t kPkMid1Len = sizeof(kPkMid1) - 1;
// TUPLE1 shape, dtype('u1') REDUCE + __setstate__, is_fortran False,
// BINBYTES header
const char kPkMid2[] =
    "\x85"
    "cnumpy\ndtype\nX\x02\x00\x00\x00u1\x89\x88\x87R"
    "(K\x03X\x01\x00\x00\x00|NNNJ\xff\xff\xff\xffJ\xff\xff\xff\xffK\x00tb"
    "\x89" "B";
const size_t kPkMid2Len = sizeof(kPkMid2) - 1;
const char kPkTail[] = "tbe.";  // TUPLE(state), BUILD, APPENDS, STOP
const size_t kPkTailLen = sizeof(kPkTail) - 1;

// pickle.dumps([name, np_uint8_1d(data)], protocol=3), memo-free
std::string PickleRecord(const std::string& name, const uint8_t* data,
                         size_t n) {
  std::string r;
  r.reserve(kPkHeadLen + 4 + name.size() + kPkMid1Len + 4 + kPkMid2Len + 4 +
            n + kPkTailLen);
  r.append(kPkHead, kPkHeadLen);
  PutU32(&r, (uint32_t)name.size());
  r += name;
  r.append(kPkMid1, kPkMid1Len);
  PutU32(&r, (uint32_t)n);
  r.append(kPkMid2, kPkMid2Len);
  PutU32(&r, (uint32_t)n);
  r.append(reinterpret_cast<const char*>(data), n);
  r.append(kPkTail, kPkTailLen);
  return r;
}

// Validate one OUR-template record at the read position of f; advances f
// past it and returns its total length (0 = mismatch/torn; f position is
// then unspecified).  Template-walk, not a pickle VM: only streams this
// binary wrote are recognized (the Python CLI writes default-protocol
// records) — resume refuses foreign streams rather than corrupt them.
size_t ScanPickleRecord(FILE* f, std::string* name) {
  char buf[64];
  auto expect = [&](const char* want, size_t n) {
    return fread(buf, 1, n, f) == n && memcmp(buf, want, n) == 0;
  };
  auto read_u32 = [&](uint32_t* v) {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    *v = (uint32_t)b[0] | ((uint32_t)b[1] << 8) | ((uint32_t)b[2] << 16) |
         ((uint32_t)b[3] << 24);
    return true;
  };
  long start = ftell(f);
  uint32_t name_len, n1, n2;
  if (!expect(kPkHead, kPkHeadLen) || !read_u32(&name_len)) return 0;
  if (name_len > 4096) return 0;  // frame names are short; cap the read
  std::string nm(name_len, '\0');
  if (fread(&nm[0], 1, name_len, f) != name_len) return 0;
  if (!expect(kPkMid1, kPkMid1Len) || !read_u32(&n1)) return 0;
  if (!expect(kPkMid2, kPkMid2Len) || !read_u32(&n2) || n1 != n2) return 0;
  if (fseek(f, (long)n1, SEEK_CUR) != 0) return 0;
  if (!expect(kPkTail, kPkTailLen)) return 0;
  long end = ftell(f);
  if (end <= start) return 0;  // data ran past EOF: fseek landed beyond it
  if (name != nullptr) *name = nm;
  return (size_t)(end - start);
}

// Append-mode mask stream with the Python writer's crash-resume repair
// (cli/predict.py _truncate_torn_pickle): scan complete records, truncate
// the torn tail, append from there.
struct PickleMaskStream {
  FILE* f = nullptr;
  std::string path;

  bool Open(const std::string& dir, bool resume) {
    path = dir + "/data.pkl";
    if (resume) {
      FILE* in = fopen(path.c_str(), "rb");
      if (in != nullptr) {
        long good = 0;
        while (ScanPickleRecord(in, nullptr) != 0) good = ftell(in);
        fseek(in, 0, SEEK_END);
        long size = ftell(in);
        fclose(in);
        if (good == 0 && size > 0) {
          fprintf(stderr,
                  "pjrt_predict: %s was not written by this binary "
                  "(foreign pickle protocol) — resume it with the Python "
                  "CLI instead\n", path.c_str());
          return false;
        }
        if (good < size && truncate(path.c_str(), good) != 0) {
          fprintf(stderr, "pjrt_predict: cannot repair %s\n", path.c_str());
          return false;
        }
      }
    }
    f = fopen(path.c_str(), resume ? "ab" : "wb");
    if (f == nullptr)
      fprintf(stderr, "pjrt_predict: cannot write %s\n", path.c_str());
    return f != nullptr;
  }

  bool Write(const std::string& name, const cv::Mat& img) {
    std::vector<uint8_t> png;
    if (!cv::imencode(".png", img, png)) return false;
    std::string rec = PickleRecord(name, png.data(), png.size());
    return fwrite(rec.data(), 1, rec.size(), f) == rec.size();
  }

  bool Close() {
    if (f == nullptr) return true;
    bool ok = fclose(f) == 0;
    f = nullptr;
    return ok;
  }
};

// Pull "mask_classes": N out of the artifact's meta.json (the exporter
// records the model config there; io_spec.txt carries only tensor specs).
// Returns -1 when absent/unreadable — the CLI default applies.
int MaskClassesFromMeta(const std::string& artifact_dir) {
  std::ifstream f(artifact_dir + "/meta.json");
  if (!f) return -1;
  std::string text((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());
  size_t at = text.find("\"mask_classes\":");
  if (at == std::string::npos) return -1;
  int v = atoi(text.c_str() + at + strlen("\"mask_classes\":"));
  return v > 0 ? v : -1;
}

// ---- crash resume ----------------------------------------------------------

// One part-JSONL line is ours iff it has the shape we (and the Python
// CLI) write: {"<name>": {...}}\n.  Returns false for torn/partial lines.
bool ParseJsonlLine(const std::string& line, std::string* name,
                    std::string* record) {
  if (line.size() < 8 || line.compare(0, 2, "{\"") != 0) return false;
  if (line.compare(line.size() - 2, 2, "}}") != 0) return false;
  size_t name_end = line.find('"', 2);
  if (name_end == std::string::npos) return false;
  size_t colon = line.find(": ", name_end);
  if (colon == std::string::npos) return false;
  *name = line.substr(2, name_end - 2);
  *record = line.substr(colon + 2, line.size() - 1 - (colon + 2));
  return true;
}

// --resume: load the frames an interrupted run already recorded in the
// part JSONL (cli/predict.py _read_resume_names semantics): a crash can
// tear the final record, so everything from the first unparsable line on
// is dropped and the file is rewritten as the clean prefix — the torn
// frames simply re-predict (at-least-once, keyed on the JSONL).
bool LoadResume(const std::string& jsonl_path,
                std::vector<std::pair<std::string, std::string>>* entries) {
  std::ifstream f(jsonl_path);
  if (!f) return true;  // nothing recorded yet
  std::string line;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    std::string name, record;
    if (!ParseJsonlLine(line, &name, &record)) break;  // torn tail
    entries->emplace_back(name, record);
  }
  f.close();
  // rewrite the clean prefix (idempotent when nothing was torn): resumed
  // appends must never concatenate onto a torn record
  std::ofstream out(jsonl_path + ".tmp");
  for (auto& kv : *entries)
    out << "{\"" << kv.first << "\": " << kv.second << "}\n";
  out.close();
  return out && rename((jsonl_path + ".tmp").c_str(),
                       jsonl_path.c_str()) == 0;
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

// --debug keeps the pre-resize originals alongside the model inputs (the
// Python CLI's keep_orig_img); at 1280x720 that is ~2.7 MB/frame riding
// the bounded queues, so the cost exists only when debug is requested
bool g_keep_orig = false;

struct Batch {
  std::vector<uint8_t> data;          // B*H*W*3 uint8 NHWC (tail zero-padded)
  std::vector<std::string> names;     // size n_valid
  std::vector<cv::Mat> origs;         // size n_valid when g_keep_orig (BGR)
  int n_valid = 0;
};

struct Result {
  std::vector<PJRT_Buffer*> outputs;  // program order
  PJRT_Buffer* input = nullptr;
  PJRT_Event* done = nullptr;
  std::vector<std::string> names;
  std::vector<cv::Mat> origs;
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
    if (g_keep_orig) b.origs.resize(valid);
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
          if (g_keep_orig) b.origs[s] = img;  // each worker owns slot s
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
                      int W, const std::unordered_set<std::string>* skip,
                      BoundedQueue<Batch>* out) {
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
  // streaming fill: recorded frames (--resume) advance the decoder with
  // grab() only; unrecorded ones append to the current batch, flushed
  // when full (so resumed batches re-pack densely, like the Python CLI)
  Batch b;
  int64_t n_skipped = 0;
  auto start_batch = [&] {
    b = Batch();
    b.data.assign((size_t)B * H * W * 3, 0);
  };
  start_batch();
  for (int64_t idx = 0; idx < n && !g_failed.load(); ++idx) {
    snprintf(name, sizeof name, "%06lld", (long long)idx);
    if (skip != nullptr && skip->count(name) != 0) {
      cap.grab();  // keep the serial decoder state in step
      ++n_skipped;
      continue;
    }
    cv::Mat frame;
    if (!cap.read(frame) || frame.empty()) {
      cap.set(cv::CAP_PROP_POS_FRAMES, (double)idx);
      if (!cap.read(frame) || frame.empty()) {
        fprintf(stderr, "pjrt_predict: frame %lld unreadable, using black\n",
                (long long)idx);
        frame = cv::Mat::zeros(H, W, CV_8UC3);
      }
    }
    b.names.push_back(name);
    if (g_keep_orig) b.origs.push_back(frame);
    PreprocessInto(frame, W, H,
                   b.data.data() + (size_t)b.n_valid * H * W * 3);
    if (++b.n_valid == B) {
      if (!out->push(std::move(b))) {
        out->close();
        return;
      }
      start_batch();
    }
  }
  if (b.n_valid > 0 && !g_failed.load()) out->push(std::move(b));
  if (n_skipped > 0)
    fprintf(stderr,
            "pjrt_predict: --resume: %lld video frames already recorded\n",
            (long long)n_skipped);
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

  // resume-ledger parsing: valid lines round-trip, torn tails drop and
  // the file rewrites as the clean prefix (cli/predict.py semantics)
  {
    std::string name, rec;
    if (!ParseJsonlLine("{\"f_01\": {\"score\": 0.5}}", &name, &rec))
      return 50;
    if (name != "f_01" || rec != "{\"score\": 0.5}") return 51;
    if (ParseJsonlLine("{\"f_02\": {\"score\": 0.", &name, &rec)) return 52;
    if (ParseJsonlLine("", &name, &rec)) return 53;

    char dir[] = "/tmp/sfh_selftest_XXXXXX";
    if (mkdtemp(dir) == nullptr) return 54;
    std::string p = std::string(dir) + "/g_court_processing.json";
    {
      std::ofstream f(p);
      f << "{\"a\": {\"score\": 0.1}}\n{\"b\": {\"score\": 0.2}}\n"
        << "{\"c\": {\"scor";  // torn tail
    }
    std::vector<std::pair<std::string, std::string>> entries;
    if (!LoadResume(p, &entries)) return 55;
    if (entries.size() != 2 || entries[1].first != "b") return 56;
    std::ifstream f(p);
    std::string text((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
    if (text != "{\"a\": {\"score\": 0.1}}\n{\"b\": {\"score\": 0.2}}\n")
      return 57;
    remove(p.c_str());
    remove(dir);
  }

  // pickle mask stream: records scan back cleanly, torn tails repair on
  // resume-open, foreign streams are refused (Python-side load parity is
  // covered by tests/test_pjrt_predict_cpp.py)
  {
    uint8_t png[] = {137, 'P', 'N', 'G', 0, 1, 2};  // payload is opaque here
    std::string rec = PickleRecord("frame_000", png, sizeof png);
    // embed template-lookalike bytes in the payload: the scanner must key
    // on structure, not on byte search
    std::string rec2 = PickleRecord(
        "f2", reinterpret_cast<const uint8_t*>(rec.data()), rec.size());

    char dir[] = "/tmp/sfh_selftest_XXXXXX";
    if (mkdtemp(dir) == nullptr) return 60;
    std::string p = std::string(dir) + "/data.pkl";
    {
      std::ofstream f(p, std::ios::binary);
      f << rec << rec2;
      f.write(rec.data(), rec.size() / 2);  // torn third record
    }
    {
      FILE* f = fopen(p.c_str(), "rb");
      std::string n1, n2;
      size_t l1 = ScanPickleRecord(f, &n1);
      size_t l2 = ScanPickleRecord(f, &n2);
      size_t l3 = ScanPickleRecord(f, nullptr);
      fclose(f);
      if (l1 != rec.size() || n1 != "frame_000") return 61;
      if (l2 != rec2.size() || n2 != "f2") return 62;
      if (l3 != 0) return 63;
    }
    PickleMaskStream st;
    if (!st.Open(std::string(dir), true) || !st.Close()) return 64;
    struct stat sb;
    if (stat(p.c_str(), &sb) != 0 ||
        (size_t)sb.st_size != rec.size() + rec2.size()) return 65;
    // foreign protocol (e.g. the Python CLI's \x80\x04 records): refuse
    {
      std::ofstream f(p, std::ios::binary | std::ios::trunc);
      f << "\x80\x04\x95 not ours";
    }
    PickleMaskStream st2;
    if (st2.Open(std::string(dir), true)) return 66;
    remove(p.c_str());
    remove(dir);
  }

  // meta.json mask_classes extraction (default path for --mask_classes)
  {
    char dir[] = "/tmp/sfh_selftest_XXXXXX";
    if (mkdtemp(dir) == nullptr) return 40;
    std::string d(dir);
    if (MaskClassesFromMeta(d) != -1) return 41;          // no meta.json
    std::ofstream f(d + "/meta.json");
    f << "{\"config\": {\"mask_classes\": 7, \"resnet_name\": \"r\"}}";
    f.close();
    if (MaskClassesFromMeta(d) != 7) return 42;
    remove((d + "/meta.json").c_str());
    remove(dir);
  }

  // overlay: 50/50 blend where the mask is non-black, frame kept elsewhere
  {
    cv::Mat frame(1, 2, CV_8UC3, cv::Scalar(100, 100, 100));
    cv::Mat mask(1, 2, CV_8UC3, cv::Scalar(0, 0, 0));
    mask.at<cv::Vec3b>(0, 1) = cv::Vec3b(0, 200, 0);
    OverlayInto(&frame, mask);
    if (frame.at<cv::Vec3b>(0, 0) != cv::Vec3b(100, 100, 100)) return 30;
    if (frame.at<cv::Vec3b>(0, 1) != cv::Vec3b(50, 150, 50)) return 31;
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
  std::string mask_save_format = "png";  // the Python CLI defaults to
                                         // "pickle"; PNG is friendlier for
                                         // a standalone binary's consumers
  int out_w = 1280, out_h = 720;      // --out_size default, like the CLI
  int mask_classes = -1;              // meta.json, else 4
  bool debug = false;
  bool resume = false;
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
    else if (a == "--mask_save_format")
      mask_save_format = val("--mask_save_format");
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
    else if (a == "--debug") debug = true;
    else if (a == "--resume") resume = true;
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
            "[--mask_type bin|gray|rgb] [--mask_save_format png|pickle] "
            "[--out_size WxH] [--mask_classes N] [--debug] [--resume]\n");
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
  if (mask_classes < 0) {
    mask_classes = MaskClassesFromMeta(artifact);
    if (mask_classes < 0) mask_classes = 4;
  }
  // the PNG writer needs the palette for rgb; the debug overlay needs it
  // for every mask type (non-rgb masks get onehot_to_image'd on top,
  // matching the Python debug path — NotImplementedError there = error here)
  bool any_mask = segm_idx >= 0 || warp_idx >= 0;
  bool need_palette = any_mask && (mask_type == "rgb" || debug);
  cv::Vec3b palette[256];
  if (need_palette && !PaletteFor(mask_classes, palette)) {
    fprintf(stderr, "pjrt_predict: no palette for %d classes "
                    "(supported: 4/7/8)\n", mask_classes);
    return 1;
  }
  if (mask_type != "gray" && mask_type != "bin" && mask_type != "rgb") {
    fprintf(stderr, "pjrt_predict: --mask_type must be bin|gray|rgb\n");
    return 1;
  }
  if (mask_save_format != "png" && mask_save_format != "pickle") {
    fprintf(stderr,
            "pjrt_predict: --mask_save_format must be png|pickle\n");
    return 1;
  }
  g_keep_orig = debug;

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

  // --resume: skip frames an interrupted run already recorded in the
  // part JSONL; append new records (cli/predict.py --resume semantics).
  // Masks for skipped frames are already on disk (PNGs are per-frame).
  std::string jsonl_path =
      dst_dir + "/" + game_name + "_court_processing.json";
  std::vector<std::pair<std::string, std::string>> entries;  // name -> json
  std::unordered_set<std::string> done;
  if (resume) {
    if (theta_idx < 0 && score_idx < 0 && poi_idx < 0) {
      fprintf(stderr,
              "pjrt_predict: --resume needs a JSON output (theta/"
              "consist_score/poi) — the JSONL is the resume ledger\n");
      return 2;
    }
    if (!LoadResume(jsonl_path, &entries)) {
      fprintf(stderr, "pjrt_predict: cannot rewrite %s\n",
              jsonl_path.c_str());
      return 1;
    }
    for (auto& kv : entries) done.insert(kv.first);
    if (!img_dir.empty() && !done.empty()) {
      size_t before = files.size();
      files.erase(std::remove_if(files.begin(), files.end(),
                                 [&](const std::string& f) {
                                   return done.count(Stem(f)) != 0;
                                 }),
                  files.end());
      fprintf(stderr,
              "pjrt_predict: --resume: %zu frames already in %s, %zu left\n",
              before - files.size(), jsonl_path.c_str(), files.size());
    }
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
              ProduceFromVideo(video, limit, B, H, W,
                               done.empty() ? nullptr : &done, &batches);
            }));

  // JSONL while processing, merged at the end — the reference's crash-
  // friendly two-phase write (predict.py:343-357,399-407); --resume
  // appends to the (torn-tail-repaired) ledger instead of truncating
  std::ofstream jsonl(jsonl_path,
                      resume ? std::ios::app : std::ios::trunc);
  if (!jsonl) {
    fprintf(stderr, "pjrt_predict: cannot write %s\n", jsonl_path.c_str());
    batches.close();
    producer.join();
    return 1;
  }

  // mask output dirs (Python save_mask_as_png postfixes, cli/predict.py)
  std::string segm_dir = dst_dir + "/court/segm_mask";
  std::string warp_dir = dst_dir + "/court/warp_mask";
  std::string debug_dir = dst_dir + "/court/debug";
  if ((segm_idx >= 0 && !MkdirP(segm_dir)) ||
      (warp_idx >= 0 && !MkdirP(warp_dir)) ||
      (debug && !MkdirP(debug_dir))) {
    fprintf(stderr, "pjrt_predict: cannot create mask dirs under %s\n",
            dst_dir.c_str());
    batches.close();
    producer.join();
    return 1;
  }
  // pickle streams: one data.pkl per mask kind, Python-compatible records
  // (torn-tail repaired + appended on --resume, like the JSONL ledger)
  PickleMaskStream segm_pkl, warp_pkl;
  if (mask_save_format == "pickle" &&
      ((segm_idx >= 0 && !segm_pkl.Open(segm_dir, resume)) ||
       (warp_idx >= 0 && !warp_pkl.Open(warp_dir, resume)))) {
    batches.close();
    producer.join();
    return 1;
  }

  std::atomic<int64_t> frames_done{0};
  double wait_ms = 0.0;  // writer time blocked on the device

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
        // mask PNGs (reference predict.py:287-315 semantics; see header);
        // the debug overlay consumes the converted warp (preferred) or
        // segm mask — exactly what the Python debug path receives
        cv::Mat debug_mask;
        for (auto& m : {std::make_tuple(segm_idx, &segm_host, &segm_dir,
                                        &segm_pkl),
                        std::make_tuple(warp_idx, &warp_host, &warp_dir,
                                        &warp_pkl)}) {
          int idx = std::get<0>(m);
          if (idx < 0) continue;
          int mh = (int)outputs[idx].dims[1], mw = (int)outputs[idx].dims[2];
          const uint8_t* labels = reinterpret_cast<const uint8_t*>(
              std::get<1>(m)->data()) + (size_t)s * mh * mw;
          cv::Mat img = ConvertMask(labels, mh, mw, mask_type, palette,
                                    out_w, out_h);
          if (debug && (idx == warp_idx || debug_mask.empty()))
            debug_mask = img;
          bool ok = mask_save_format == "pickle"
              ? std::get<3>(m)->Write(r.names[s], img)
              : cv::imwrite(*std::get<2>(m) + "/" + r.names[s] + ".png",
                            img);
          if (!ok) {
            Fail(("cannot write mask for " + r.names[s] + " under " +
                  *std::get<2>(m)).c_str());
            results.close();
            break;
          }
        }
        if (g_failed.load()) break;
        if (debug) {
          RenderDebug(r.origs[s],
                      debug_mask.empty() ? nullptr : &debug_mask, mask_type,
                      palette,
                      poi != nullptr ? poi + s * poi_per : nullptr,
                      poi_per / 2,
                      score != nullptr ? score + s : nullptr,
                      debug_dir + "/" + r.names[s] + ".jpeg");
          if (g_failed.load()) { results.close(); break; }
        }
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
    r.origs = std::move(b.origs);
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
  if (!segm_pkl.Close() || !warp_pkl.Close()) {
    fprintf(stderr, "pjrt_predict: pickle stream close failed\n");
    g_failed.store(true);
  }
  auto tp1 = std::chrono::steady_clock::now();

  if (g_failed.load()) {
    fprintf(stderr, "pjrt_predict: FAILED after %lld frames\n",
            (long long)frames_done.load());
    return 1;
  }

  // ---- merge JSONL -> {game}_court.json ------------------------------------
  std::string court_path = dst_dir + "/" + game_name + "_court.json";
  {
    // keep-last dedupe: resume is at-least-once, so a torn frame can be
    // re-predicted — like the Python CLI's JSONL->dict merge, last wins
    std::unordered_map<std::string, size_t> last;
    for (size_t i = 0; i < entries.size(); ++i) last[entries[i].first] = i;
    std::ofstream f(court_path);
    f << "{\n";
    for (size_t i = 0; i < entries.size(); ++i)
      if (last[entries[i].first] == i)
        f << "  \"" << entries[i].first << "\": " << entries[i].second
          << ",\n";
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
