// pjrt_http_serve: zero-Python online HTTP serving — frames in, homography
// JSON out, dynamic batching over the PJRT C API.
//
// Native analog of the Python serving stack (serve.py ->
// sports_field_homography_tpu/serve/server.py + serve/batcher.py): the same
// endpoint surface and batching policy, with the entire runtime in C++.
// The reference has no online serving story at all (its production path is
// the offline batch CLI, /root/reference/predict.py); this binary completes
// the TPU deployment picture for hosts where Python is unavailable or
// unwanted: one process, one dlopen'd PJRT plugin, no interpreter.
//
// Endpoints (mirroring serve/server.py):
//   POST /predict  — body = one encoded image (JPEG/PNG, any size; resized
//                    server-side with the video-ingest semantics of
//                    data/dataset.py VideoDataset.preprocess_frame:
//                    INTER_AREA when downscaling else INTER_LINEAR).
//                    Response JSON: {"theta": 3x3, "score": s,
//                    "poi": [[x,y]...], "segm_mask_png"/"warp_mask_png":
//                    base64 PNG} per the artifact's outputs.
//   GET /healthz   — liveness + plugin path.
//   GET /stats     — batcher counters and latency quantiles (JSON).
//   GET /metrics   — the same counters in the Prometheus text format
//                    (identical metric names to the Python server).
//
// Batching: XLA programs are compiled per static shape and the chip peaks
// at multiple-of-8 batches (BASELINE.md serving sweep: batch 1 = 7 ms /
// 143 fps, batch 32 = 107 ms / 299 fps), so concurrent single-frame
// requests are coalesced — first frame blocks, then up to --max_delay_ms
// of arrivals join, the group is padded to the smallest compiled bucket,
// one execute serves everyone.  Buckets come from the artifact list: each
// positional <artifact_dir> is a fixed-batch StableHLO serving export
// (compat/serving.save_serving sidecars: module.mlir.bc +
// compile_options.pb + io_spec.txt) and its batch size becomes one bucket;
// export e.g. batches 1,2,4,8 of the SAME checkpoint for a latency/
// throughput-adaptive endpoint (scripts/export_serving.py).
//
// Usage:
//   pjrt_http_serve <artifact_dir> [<artifact_dir> ...]
//       [--port 8800] [--host 0.0.0.0] [--plugin /opt/axon/libaxon_pjrt.so]
//       [--opt key=value ...] [--max_delay_ms 8] [--channel_order bgr|rgb]
//       [--no_warmup] [--timeout_s 120] [--idle_timeout_s 60]
//       [--max_connections 256] [--echo]
//
// Hardening: every accepted connection gets SO_RCVTIMEO/SO_SNDTIMEO of
// --idle_timeout_s (slowloris / stalled clients are disconnected instead
// of parking a thread + fd forever) and live connections are capped at
// --max_connections (excess connections get an immediate 503).  --echo
// serves the full HTTP layer with inference stubbed out (no plugin /
// artifacts needed) for the adversarial-client tests
// (tests/test_http_hardening_cpp.py).
//
// For the axon TPU plugin pass the same --opt set as pjrt_serve.cc.
// --port 0 binds an ephemeral port; the bound port is printed to stdout as
// "pjrt_http_serve: listening on port N" (tests parse it).
#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <signal.h>
#include <sys/socket.h>
#include <sys/types.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <future>
#include <map>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "pjrt_common.h"

namespace {

using sfh::Api;
using sfh::AwaitEvent;
using sfh::CheckError;
using sfh::TensorSpec;
using Clock = std::chrono::steady_clock;

// ---- small utilities -------------------------------------------------------

// JSON float formatting: enough digits to round-trip a float32 exactly
// (the Python server emits json.dumps(float(...)) the same way).
std::string JsonFloat(float v) {
  char buf[32];
  snprintf(buf, sizeof buf, "%.9g", (double)v);
  return buf;
}

std::string Base64(const uint8_t* data, size_t n) {
  static const char tab[] =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  out.reserve((n + 2) / 3 * 4);
  size_t i = 0;
  for (; i + 3 <= n; i += 3) {
    uint32_t v = (data[i] << 16) | (data[i + 1] << 8) | data[i + 2];
    out.push_back(tab[(v >> 18) & 63]);
    out.push_back(tab[(v >> 12) & 63]);
    out.push_back(tab[(v >> 6) & 63]);
    out.push_back(tab[v & 63]);
  }
  if (i + 1 == n) {
    uint32_t v = data[i] << 16;
    out.push_back(tab[(v >> 18) & 63]);
    out.push_back(tab[(v >> 12) & 63]);
    out += "==";
  } else if (i + 2 == n) {
    uint32_t v = (data[i] << 16) | (data[i + 1] << 8);
    out.push_back(tab[(v >> 18) & 63]);
    out.push_back(tab[(v >> 12) & 63]);
    out.push_back(tab[(v >> 6) & 63]);
    out.push_back('=');
  }
  return out;
}

// ---- artifacts -------------------------------------------------------------

struct Artifact {
  std::string dir;
  TensorSpec input;
  std::vector<TensorSpec> outputs;
  std::string module_bc, compile_options;
  PJRT_LoadedExecutable* exec = nullptr;
  int B = 0;
};

bool LoadArtifactFiles(const std::string& dir, Artifact* a) {
  a->dir = dir;
  std::string io_spec_text;
  if (!sfh::ReadFile(dir + "/module.mlir.bc", &a->module_bc) ||
      !sfh::ReadFile(dir + "/compile_options.pb", &a->compile_options) ||
      !sfh::ReadFile(dir + "/io_spec.txt", &io_spec_text))
    return false;
  if (!sfh::ParseIoSpec(io_spec_text, &a->input, &a->outputs)) return false;
  if (a->input.dtype != "uint8" || a->input.dims.size() != 4 ||
      a->input.dims[3] != 3) {
    fprintf(stderr,
            "pjrt_http_serve: %s: artifact input must be uint8 [B,H,W,3], "
            "got %s rank %zu (export with input_dtype='uint8')\n",
            dir.c_str(), a->input.dtype.c_str(), a->input.dims.size());
    return false;
  }
  a->B = (int)a->input.dims[0];
  return true;
}

// Every artifact must be the same program at a different batch size: same
// H/W, same output names/dtypes (dims differ only in the batch dim).
bool ArtifactsCompatible(const Artifact& a, const Artifact& b) {
  if (a.input.dims[1] != b.input.dims[1] ||
      a.input.dims[2] != b.input.dims[2])
    return false;
  if (a.outputs.size() != b.outputs.size()) return false;
  for (size_t i = 0; i < a.outputs.size(); ++i)
    if (a.outputs[i].name != b.outputs[i].name ||
        a.outputs[i].dtype != b.outputs[i].dtype)
      return false;
  return true;
}

// ---- dynamic batcher -------------------------------------------------------

struct Reply {
  int status = 500;
  std::string body;  // JSON
};

struct Pending {
  std::vector<uint8_t> frame;  // H*W*3 uint8, model channel order
  std::promise<Reply> prom;
  Clock::time_point t_submit;
};

struct OutputIdx {
  int theta = -1, score = -1, poi = -1, segm = -1, warp = -1;
};

class Batcher {
 public:
  Batcher(PJRT_Client* client, PJRT_Device* device,
          std::vector<Artifact>* artifacts, OutputIdx idx,
          double max_delay_ms)
      : client_(client), device_(device), artifacts_(artifacts), idx_(idx),
        max_delay_(max_delay_ms / 1e3) {
    for (auto& a : *artifacts_) buckets_.push_back(a.B);
    max_batch_ = buckets_.back();
  }

  void Start() { worker_ = std::thread([this] { Loop(); }); }

  // Enqueue one frame; the future resolves with the request's slice of a
  // batched execute (or an error reply).
  std::future<Reply> Submit(std::vector<uint8_t> frame) {
    auto p = std::make_unique<Pending>();
    p->frame = std::move(frame);
    p->t_submit = Clock::now();
    std::future<Reply> fut = p->prom.get_future();
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (shutdown_) {
        Reply r;
        r.status = 503;
        r.body = "{\"error\": \"server is shutting down\"}";
        p->prom.set_value(std::move(r));
        return fut;
      }
      q_.push_back(std::move(p));
    }
    cv_.notify_all();
    return fut;
  }

  // Stop accepting, serve everything already enqueued, join the worker —
  // the same drain semantics as the Python batcher's close().
  void Shutdown() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      shutdown_ = true;
    }
    cv_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  // Compile-and-run every bucket once on zero frames (first-request
  // compiles through a TPU tunnel take minutes; warm them up front).
  bool Warmup() {
    const Artifact& a0 = (*artifacts_)[0];
    int h = (int)a0.input.dims[1], w = (int)a0.input.dims[2];
    for (auto& a : *artifacts_) {
      std::vector<uint8_t> zeros((size_t)a.B * h * w * 3, 0);
      std::vector<std::vector<char>> hosts;
      auto t0 = Clock::now();
      if (!Execute(a, zeros.data(), &hosts)) return false;
      auto t1 = Clock::now();
      fprintf(stderr, "pjrt_http_serve: bucket %d warm (%.1f ms)\n", a.B,
              std::chrono::duration<double, std::milli>(t1 - t0).count());
    }
    return true;
  }

  // Pick the smallest bucket that fits n (the Python _bucket_for policy).
  int BucketFor(int n) const {
    for (int b : buckets_)
      if (b >= n) return b;
    return buckets_.back();
  }
  const std::vector<int>& buckets() const { return buckets_; }
  int max_batch() const { return max_batch_; }
  double max_delay_ms() const { return max_delay_ * 1e3; }

  // JSON stats, mirroring serve/batcher.py DynamicBatcher.stats().
  std::string StatsJson() {
    std::lock_guard<std::mutex> lk(stats_mu_);
    std::ostringstream os;
    os << "{\"requests\": " << n_requests_ << ", \"batches\": " << n_batches_
       << ", \"errors\": " << n_errors_ << ", \"batch_hist\": {";
    bool first = true;
    for (auto& kv : batch_hist_) {
      if (!first) os << ", ";
      os << "\"" << kv.first << "\": " << kv.second;
      first = false;
    }
    os << "}, \"mean_occupancy\": ";
    if (n_batches_)
      os << JsonFloat((float)((double)occupancy_sum_ / n_batches_));
    else
      os << "null";
    os << ", \"buckets\": [";
    for (size_t i = 0; i < buckets_.size(); ++i)
      os << (i ? ", " : "") << buckets_[i];
    os << "], \"max_delay_ms\": " << JsonFloat((float)(max_delay_ * 1e3));
    std::vector<double> lat(latencies_.begin(), latencies_.end());
    std::sort(lat.begin(), lat.end());
    auto q = [&](double f) -> std::string {
      if (lat.empty()) return "null";
      size_t i = std::min(lat.size() - 1, (size_t)(f * lat.size()));
      char buf[32];
      snprintf(buf, sizeof buf, "%.2f", lat[i] * 1e3);
      return buf;
    };
    os << ", \"latency_ms\": {\"p50\": " << q(0.50) << ", \"p90\": "
       << q(0.90) << ", \"p99\": " << q(0.99) << "}}";
    return os.str();
  }

  // Prometheus text exposition, mirroring serve/server.py
  // _prometheus_metrics (same metric names: one scrape config covers both
  // the Python and C++ servers).
  std::string PrometheusText() {
    std::lock_guard<std::mutex> lk(stats_mu_);
    std::ostringstream os;
    os << "# TYPE sfh_requests_total counter\n"
       << "sfh_requests_total " << n_requests_ << "\n"
       << "# TYPE sfh_batches_total counter\n"
       << "sfh_batches_total " << n_batches_ << "\n"
       << "# TYPE sfh_errors_total counter\n"
       << "sfh_errors_total " << n_errors_ << "\n";
    if (n_batches_) {
      char buf[32];
      snprintf(buf, sizeof buf, "%.4f", (double)occupancy_sum_ / n_batches_);
      os << "# TYPE sfh_batch_occupancy_mean gauge\n"
         << "sfh_batch_occupancy_mean " << buf << "\n";
    }
    os << "# TYPE sfh_batches_by_bucket_total counter\n";
    for (auto& kv : batch_hist_)
      os << "sfh_batches_by_bucket_total{bucket=\"" << kv.first << "\"} "
         << kv.second << "\n";
    std::vector<double> lat(latencies_.begin(), latencies_.end());
    std::sort(lat.begin(), lat.end());
    os << "# TYPE sfh_request_latency_ms gauge\n";
    if (!lat.empty()) {
      auto q = [&](double f) {
        size_t i = std::min(lat.size() - 1, (size_t)(f * lat.size()));
        return lat[i] * 1e3;
      };
      char buf[64];
      snprintf(buf, sizeof buf,
               "sfh_request_latency_ms{quantile=\"p50\"} %.2f\n", q(0.50));
      os << buf;
      snprintf(buf, sizeof buf,
               "sfh_request_latency_ms{quantile=\"p90\"} %.2f\n", q(0.90));
      os << buf;
      snprintf(buf, sizeof buf,
               "sfh_request_latency_ms{quantile=\"p99\"} %.2f\n", q(0.99));
      os << buf;
    }
    return os.str();
  }

 private:
  // One synchronous execute of artifact ``a`` on ``data`` (B*H*W*3 uint8);
  // fetches every output into ``hosts`` (indexed like a.outputs).
  bool Execute(const Artifact& a, const uint8_t* data,
               std::vector<std::vector<char>>* hosts) {
    PJRT_Buffer* in_buf = sfh::UploadBuffer(client_, device_, data,
                                            PJRT_Buffer_Type_U8,
                                            a.input.dims);
    if (in_buf == nullptr) return false;
    size_t n_out = a.outputs.size();
    std::vector<PJRT_Buffer*> out_buf(n_out, nullptr);
    PJRT_Buffer** out_list = out_buf.data();
    PJRT_Buffer* const arg_list[] = {in_buf};
    PJRT_Buffer* const* const arg_lists[] = {arg_list};
    PJRT_ExecuteOptions eo;
    memset(&eo, 0, sizeof eo);
    eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args ex;
    memset(&ex, 0, sizeof ex);
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = a.exec;
    ex.options = &eo;
    ex.argument_lists = arg_lists;
    ex.num_devices = 1;
    ex.num_args = 1;
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;
    bool ok = CheckError(Api()->PJRT_LoadedExecutable_Execute(&ex),
                         "Execute");
    if (ok) ok = AwaitEvent(done, "execution");
    hosts->assign(n_out, {});
    for (size_t i = 0; i < n_out && ok; ++i)
      ok = sfh::FetchBuffer(out_buf[i], &(*hosts)[i]);
    for (PJRT_Buffer* b : out_buf)
      sfh::DestroyBuffer(b, "Buffer_Destroy(output)");
    sfh::DestroyBuffer(in_buf, "Buffer_Destroy(input)");
    return ok;
  }

  // One group: first item blocking, then whatever arrives within
  // max_delay of it, capped at the largest bucket (the Python _collect).
  // Returns false when shut down with an empty queue.
  bool Collect(std::vector<std::unique_ptr<Pending>>* group) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_.wait(lk, [&] { return !q_.empty() || shutdown_; });
    if (q_.empty()) return false;  // shutdown drain complete
    group->push_back(std::move(q_.front()));
    q_.pop_front();
    auto deadline = Clock::now() +
                    std::chrono::duration_cast<Clock::duration>(
                        std::chrono::duration<double>(max_delay_));
    while ((int)group->size() < max_batch_) {
      if (q_.empty()) {
        if (shutdown_) break;  // no more arrivals are coming
        if (cv_.wait_until(lk, deadline) == std::cv_status::timeout &&
            q_.empty())
          break;
        continue;
      }
      group->push_back(std::move(q_.front()));
      q_.pop_front();
    }
    return true;
  }

  void Loop() {
    const Artifact& a0 = (*artifacts_)[0];
    int h = (int)a0.input.dims[1], w = (int)a0.input.dims[2];
    size_t frame_bytes = (size_t)h * w * 3;
    for (;;) {
      std::vector<std::unique_ptr<Pending>> group;
      if (!Collect(&group)) return;
      int n = (int)group.size();
      int bucket = BucketFor(n);
      const Artifact* art = nullptr;
      for (auto& a : *artifacts_)
        if (a.B == bucket) art = &a;
      // assemble the padded batch; pad lanes repeat frame 0 (keeps every
      // lane a valid image, same choice as the Python batcher)
      std::vector<uint8_t> batch((size_t)bucket * frame_bytes);
      for (int i = 0; i < bucket; ++i)
        memcpy(batch.data() + (size_t)i * frame_bytes,
               group[i < n ? i : 0]->frame.data(), frame_bytes);
      std::vector<std::vector<char>> hosts;
      bool ok = Execute(*art, batch.data(), &hosts);
      auto t1 = Clock::now();
      if (ok) {
        for (int i = 0; i < n; ++i) {
          Reply r;
          r.status = 200;
          r.body = SliceJson(*art, hosts, i);
          group[i]->prom.set_value(std::move(r));
        }
      } else {
        for (int i = 0; i < n; ++i) {
          Reply r;
          r.status = 500;
          r.body = "{\"error\": \"predict failed (see server log)\"}";
          group[i]->prom.set_value(std::move(r));
        }
      }
      std::lock_guard<std::mutex> lk(stats_mu_);
      n_requests_ += n;
      n_batches_ += 1;
      if (!ok) n_errors_ += 1;
      batch_hist_[bucket] += 1;
      occupancy_sum_ += n;
      for (int i = 0; i < n; ++i) {
        latencies_.push_back(
            std::chrono::duration<double>(t1 - group[i]->t_submit).count());
        if (latencies_.size() > 1024) latencies_.pop_front();
      }
    }
  }

  // Request i's slice of the batch outputs -> response JSON (the value
  // conventions of serve/server.py _response_json).
  std::string SliceJson(const Artifact& a,
                        const std::vector<std::vector<char>>& hosts,
                        int i) {
    std::ostringstream os;
    os << "{";
    bool first = true;
    if (idx_.theta >= 0) {
      const float* t = (const float*)hosts[idx_.theta].data() + (size_t)i * 9;
      os << "\"theta\": [";
      for (int r = 0; r < 3; ++r) {
        os << (r ? ", [" : "[");
        for (int c = 0; c < 3; ++c)
          os << (c ? ", " : "") << JsonFloat(t[r * 3 + c]);
        os << "]";
      }
      os << "]";
      first = false;
    }
    if (idx_.score >= 0) {
      const float* s = (const float*)hosts[idx_.score].data();
      os << (first ? "" : ", ") << "\"score\": " << JsonFloat(s[i]);
      first = false;
    }
    if (idx_.poi >= 0) {
      const TensorSpec& spec = a.outputs[idx_.poi];
      int64_t n_poi = spec.dims[spec.dims.size() - 2];
      const float* p =
          (const float*)hosts[idx_.poi].data() + (size_t)i * n_poi * 2;
      os << (first ? "" : ", ") << "\"poi\": [";
      for (int64_t k = 0; k < n_poi; ++k)
        os << (k ? ", [" : "[") << JsonFloat(p[k * 2]) << ", "
           << JsonFloat(p[k * 2 + 1]) << "]";
      os << "]";
      first = false;
    }
    struct MaskOut { int idx; const char* key; };
    for (MaskOut m : {MaskOut{idx_.segm, "segm_mask_png"},
                      MaskOut{idx_.warp, "warp_mask_png"}}) {
      if (m.idx < 0) continue;
      const TensorSpec& spec = a.outputs[m.idx];
      int mh = (int)spec.dims[1], mw = (int)spec.dims[2];
      const uint8_t* labels = (const uint8_t*)hosts[m.idx].data() +
                              (size_t)i * mh * mw;
      cv::Mat mask(mh, mw, CV_8UC1, const_cast<uint8_t*>(labels));
      std::vector<uchar> png;
      cv::imencode(".png", mask, png);
      os << (first ? "" : ", ") << "\"" << m.key << "\": \""
         << Base64(png.data(), png.size()) << "\"";
      first = false;
    }
    os << "}";
    return os.str();
  }

  PJRT_Client* client_;
  PJRT_Device* device_;
  std::vector<Artifact>* artifacts_;
  OutputIdx idx_;
  double max_delay_;
  std::vector<int> buckets_;
  int max_batch_;

  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<std::unique_ptr<Pending>> q_;
  bool shutdown_ = false;
  std::thread worker_;

  std::mutex stats_mu_;
  int64_t n_requests_ = 0, n_batches_ = 0, n_errors_ = 0;
  std::map<int, int64_t> batch_hist_;
  int64_t occupancy_sum_ = 0;
  std::deque<double> latencies_;
};

// ---- HTTP ------------------------------------------------------------------

struct HttpRequest {
  std::string method, path;
  size_t content_length = 0;
  bool keep_alive = true;  // HTTP/1.1 default
  std::string body;
};

// Parse one request from a buffered fd reader.  ``buf`` carries bytes read
// past the previous request (pipelining/keep-alive).  Returns false on
// EOF/parse error/oversized body, or when ``deadline`` passes — the
// OVERALL per-request read deadline: SO_RCVTIMEO alone only bounds each
// recv, so a drip-feeding client (1 byte per idle_timeout) could
// otherwise hold a handler slot indefinitely.
bool ReadHttpRequest(int fd, std::string* buf, HttpRequest* req,
                     Clock::time_point deadline,
                     size_t max_body = 32u << 20) {
  // read until the header terminator
  size_t hdr_end;
  while ((hdr_end = buf->find("\r\n\r\n")) == std::string::npos) {
    if (buf->size() > 65536) return false;
    if (Clock::now() >= deadline) return false;
    char tmp[4096];
    ssize_t n = recv(fd, tmp, sizeof tmp, 0);
    if (n <= 0) return false;
    buf->append(tmp, n);
  }
  std::string headers = buf->substr(0, hdr_end);
  buf->erase(0, hdr_end + 4);

  std::istringstream hs(headers);
  std::string line;
  if (!std::getline(hs, line)) return false;
  if (!line.empty() && line.back() == '\r') line.pop_back();
  {
    std::istringstream rl(line);
    std::string version;
    rl >> req->method >> req->path >> version;
    if (req->method.empty() || req->path.empty()) return false;
    if (version == "HTTP/1.0") req->keep_alive = false;
  }
  while (std::getline(hs, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    size_t c = line.find(':');
    if (c == std::string::npos) continue;
    std::string k = line.substr(0, c);
    std::transform(k.begin(), k.end(), k.begin(), ::tolower);
    std::string v = line.substr(c + 1);
    while (!v.empty() && v.front() == ' ') v.erase(0, 1);
    if (k == "content-length") req->content_length = strtoull(
        v.c_str(), nullptr, 10);
    else if (k == "connection") {
      std::transform(v.begin(), v.end(), v.begin(), ::tolower);
      if (v == "close") req->keep_alive = false;
      else if (v == "keep-alive") req->keep_alive = true;
    }
  }
  if (req->content_length > max_body) return false;
  while (buf->size() < req->content_length) {
    if (Clock::now() >= deadline) return false;
    char tmp[65536];
    size_t want = std::min(sizeof tmp,
                           req->content_length - buf->size());
    ssize_t n = recv(fd, tmp, want, 0);
    if (n <= 0) return false;
    buf->append(tmp, n);
  }
  req->body = buf->substr(0, req->content_length);
  buf->erase(0, req->content_length);
  return true;
}

void SendResponse(int fd, int status, const std::string& content_type,
                  const std::string& body, bool keep_alive) {
  const char* reason = status == 200 ? "OK"
                       : status == 400 ? "Bad Request"
                       : status == 404 ? "Not Found"
                       : status == 503 ? "Service Unavailable"
                       : status == 504 ? "Gateway Timeout"
                       : "Internal Server Error";
  std::ostringstream os;
  os << "HTTP/1.1 " << status << " " << reason << "\r\n"
     << "Content-Type: " << content_type << "\r\n"
     << "Content-Length: " << body.size() << "\r\n"
     << "Connection: " << (keep_alive ? "keep-alive" : "close") << "\r\n"
     << "\r\n"
     << body;
  std::string out = os.str();
  size_t off = 0;
  while (off < out.size()) {
    ssize_t n = send(fd, out.data() + off, out.size() - off, MSG_NOSIGNAL);
    if (n <= 0) return;
    off += n;
  }
}

// ---- service state ---------------------------------------------------------

struct Service {
  Batcher* batcher = nullptr;  // null in --echo mode (HTTP layer only)
  int H = 0, W = 0;
  bool to_rgb = false;  // --channel_order rgb
  double timeout_s = 120.0;
  double idle_timeout_s = 60.0;  // per-recv AND whole-request-read bound
  std::string plugin;
};

// Live connection count for the --max_connections cap: a slowloris or
// connection flood must not grow handler threads/fds without bound.
std::atomic<int> g_active_conns{0};

// Decode + resize one request body into a model frame (the Python
// server's do_POST preprocessing: cv2.imdecode -> optional BGR->RGB ->
// VideoDataset resize semantics).
int PreprocessBody(const Service& svc, const std::string& body,
                   std::vector<uint8_t>* frame, std::string* err) {
  cv::Mat raw(1, (int)body.size(), CV_8UC1, const_cast<char*>(body.data()));
  cv::Mat img = cv::imdecode(raw, cv::IMREAD_COLOR);  // BGR, 3 channels
  if (img.empty()) {
    *err = "body is not a decodable image";
    return 400;
  }
  if (svc.to_rgb) cv::cvtColor(img, img, cv::COLOR_BGR2RGB);
  if (img.cols != svc.W || img.rows != svc.H) {
    int inter = img.cols > svc.W ? cv::INTER_AREA : cv::INTER_LINEAR;
    cv::resize(img, img, cv::Size(svc.W, svc.H), 0, 0, inter);
  }
  frame->resize((size_t)svc.H * svc.W * 3);
  if (img.isContinuous()) {
    memcpy(frame->data(), img.data, frame->size());
  } else {
    for (int r = 0; r < svc.H; ++r)
      memcpy(frame->data() + (size_t)r * svc.W * 3, img.ptr(r),
             (size_t)svc.W * 3);
  }
  return 200;
}

void HandleConnection(int fd, const Service* svc) {
  std::string buf;
  for (;;) {
    HttpRequest req;
    auto deadline = Clock::now() + std::chrono::duration_cast<Clock::duration>(
        std::chrono::duration<double>(svc->idle_timeout_s));
    if (!ReadHttpRequest(fd, &buf, &req, deadline)) break;
    bool ka = req.keep_alive;
    if (req.method == "GET" && req.path == "/healthz") {
      SendResponse(fd, 200, "application/json",
                   "{\"ok\": true, \"backend\": \"pjrt\", \"plugin\": \"" +
                       svc->plugin + "\"}",
                   ka);
    } else if (req.method == "GET" && req.path == "/stats") {
      SendResponse(fd, 200, "application/json",
                   svc->batcher ? svc->batcher->StatsJson()
                                : std::string("{\"echo\": true}"),
                   ka);
    } else if (req.method == "GET" && req.path == "/metrics") {
      SendResponse(fd, 200, "text/plain; version=0.0.4; charset=utf-8",
                   svc->batcher ? svc->batcher->PrometheusText()
                                : std::string("sfh_echo 1\n"),
                   ka);
    } else if (req.method == "POST" && req.path == "/predict") {
      std::vector<uint8_t> frame;
      std::string err;
      int code = PreprocessBody(*svc, req.body, &frame, &err);
      if (code != 200) {
        SendResponse(fd, code, "application/json",
                     "{\"error\": \"" + err + "\"}", ka);
      } else if (svc->batcher == nullptr) {
        // --echo: exercise decode/resize + the HTTP layer, skip inference
        SendResponse(fd, 200, "application/json",
                     "{\"echo\": true, \"score\": 0.0}", ka);
      } else {
        std::future<Reply> fut = svc->batcher->Submit(std::move(frame));
        if (fut.wait_for(std::chrono::duration<double>(svc->timeout_s)) !=
            std::future_status::ready) {
          SendResponse(fd, 504, "application/json",
                       "{\"error\": \"predict timed out\"}", ka);
        } else {
          Reply r = fut.get();
          SendResponse(fd, r.status, "application/json", r.body, ka);
        }
      }
    } else {
      SendResponse(fd, 404, "application/json",
                   "{\"error\": \"unknown path; use POST /predict, GET "
                   "/healthz, GET /stats, GET /metrics\"}",
                   ka);
    }
    if (!ka) break;
  }
  close(fd);
  g_active_conns.fetch_sub(1);
}

// ---- shutdown plumbing -----------------------------------------------------

std::atomic<bool> g_stop{false};
std::atomic<int> g_listen_fd{-1};

void OnSignal(int) {
  g_stop.store(true);
  int fd = g_listen_fd.exchange(-1);
  // closing the listener wakes accept(); in-flight requests drain via the
  // batcher shutdown (the Python server's SIGTERM drain semantics)
  if (fd >= 0) {
    shutdown(fd, SHUT_RDWR);
    close(fd);
  }
}

// ---- selftest (no plugin, no network device needed) ------------------------

int SelfTest() {
  // base64 (RFC 4648 vectors)
  if (Base64((const uint8_t*)"", 0) != "") return 10;
  if (Base64((const uint8_t*)"f", 1) != "Zg==") return 11;
  if (Base64((const uint8_t*)"fo", 2) != "Zm8=") return 12;
  if (Base64((const uint8_t*)"foo", 3) != "Zm9v") return 13;
  if (Base64((const uint8_t*)"foobar", 6) != "Zm9vYmFy") return 14;

  // HTTP request parsing over a socketpair (headers split across writes,
  // keep-alive pipelining, HTTP/1.0 close default)
  {
    int sp[2];
    if (socketpair(AF_UNIX, SOCK_STREAM, 0, sp) != 0) return 20;
    const char part1[] = "POST /predict HTTP/1.1\r\nContent-Le";
    const char part2[] = "ngth: 5\r\nConnection: keep-alive\r\n\r\nhello"
                         "GET /stats HTTP/1.0\r\n\r\n";
    if (write(sp[1], part1, sizeof part1 - 1) != (ssize_t)(sizeof part1 - 1))
      return 21;
    std::string buf;
    std::thread writer([&] {
      usleep(20000);
      (void)!write(sp[1], part2, sizeof part2 - 1);
      shutdown(sp[1], SHUT_WR);
    });
    HttpRequest r1;
    auto dl = Clock::now() + std::chrono::seconds(30);
    bool ok1 = ReadHttpRequest(sp[0], &buf, &r1, dl);
    writer.join();
    if (!ok1 || r1.method != "POST" || r1.path != "/predict" ||
        r1.body != "hello" || !r1.keep_alive)
      return 22;
    HttpRequest r2;
    if (!ReadHttpRequest(sp[0], &buf, &r2, dl) || r2.method != "GET" ||
        r2.path != "/stats" || r2.keep_alive || !r2.body.empty())
      return 23;
    HttpRequest r3;
    if (ReadHttpRequest(sp[0], &buf, &r3, dl)) return 24;  // EOF
    close(sp[0]);
    close(sp[1]);
  }

  // oversized body must be rejected, not buffered
  {
    int sp[2];
    if (socketpair(AF_UNIX, SOCK_STREAM, 0, sp) != 0) return 30;
    const char hdr[] = "POST /predict HTTP/1.1\r\nContent-Length: 99\r\n\r\n";
    if (write(sp[1], hdr, sizeof hdr - 1) != (ssize_t)(sizeof hdr - 1))
      return 31;
    shutdown(sp[1], SHUT_WR);
    std::string buf;
    HttpRequest r;
    if (ReadHttpRequest(sp[0], &buf, &r,
                        Clock::now() + std::chrono::seconds(30),
                        /*max_body=*/64)) return 32;
    close(sp[0]);
    close(sp[1]);
  }

  // JSON float formatting round-trips float32
  for (float v : {0.0f, 1.5f, -3.1415927f, 1e-7f, 1234567.0f}) {
    if ((float)atof(JsonFloat(v).c_str()) != v) return 40;
  }

  fprintf(stderr, "pjrt_http_serve: selftest OK\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc == 2 && std::string(argv[1]) == "--selftest") {
    int rc = SelfTest();
    if (rc != 0)
      fprintf(stderr, "pjrt_http_serve: selftest FAILED (%d)\n", rc);
    return rc;
  }

  std::vector<std::string> artifact_dirs;
  std::string host = "0.0.0.0";
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  std::string channel_order = "bgr";
  std::vector<std::pair<std::string, std::string>> raw_opts;
  int port = 8800;
  double max_delay_ms = 8.0, timeout_s = 120.0;
  // socket recv/send timeout: a stalled or slowloris client parks a
  // handler thread for at most this long before the connection closes
  double idle_timeout_s = 60.0;
  int max_connections = 256;  // flood cap: beyond this, immediate 503
  bool warmup = true;
  bool echo = false;  // HTTP layer only (no plugin/artifacts) — for tests
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--host" && i + 1 < argc) host = argv[++i];
    else if (a == "--plugin" && i + 1 < argc) plugin = argv[++i];
    else if (a == "--max_delay_ms" && i + 1 < argc)
      max_delay_ms = atof(argv[++i]);
    else if (a == "--timeout_s" && i + 1 < argc) timeout_s = atof(argv[++i]);
    else if (a == "--idle_timeout_s" && i + 1 < argc)
      idle_timeout_s = atof(argv[++i]);
    else if (a == "--max_connections" && i + 1 < argc)
      max_connections = atoi(argv[++i]);
    else if (a == "--echo") echo = true;
    else if (a == "--channel_order" && i + 1 < argc)
      channel_order = argv[++i];
    else if (a == "--no_warmup") warmup = false;
    else if (a == "--opt" && i + 1 < argc) {
      std::string kv = argv[++i];
      size_t eq = kv.find('=');
      if (eq == std::string::npos) {
        fprintf(stderr, "pjrt_http_serve: --opt expects key=value\n");
        return 2;
      }
      raw_opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else if (!a.empty() && a[0] == '-') {
      fprintf(stderr, "pjrt_http_serve: unknown flag %s\n", a.c_str());
      return 2;
    } else {
      artifact_dirs.push_back(a);
    }
  }
  if (artifact_dirs.empty() && !echo) {
    fprintf(stderr,
            "usage: pjrt_http_serve <artifact_dir> [<artifact_dir> ...]\n"
            "    [--port 8800] [--host 0.0.0.0] [--plugin so]\n"
            "    [--opt k=v ...] [--max_delay_ms 8]\n"
            "    [--channel_order bgr|rgb] [--no_warmup] [--timeout_s 120]\n"
            "    [--idle_timeout_s 60] [--max_connections 256] [--echo]\n");
    return 2;
  }
  if (channel_order != "bgr" && channel_order != "rgb") {
    fprintf(stderr, "pjrt_http_serve: --channel_order must be bgr|rgb\n");
    return 2;
  }

  // ---- artifacts + plugin (skipped entirely in --echo mode) -----------
  std::vector<Artifact> artifacts;
  std::unique_ptr<Batcher> batcher;
  PJRT_Client* client = nullptr;
  Service svc;
  svc.to_rgb = channel_order == "rgb";
  svc.timeout_s = timeout_s;
  svc.idle_timeout_s = idle_timeout_s;
  svc.plugin = echo ? std::string("none (echo mode)") : plugin;
  if (echo) {
    // fixed echo frame shape: decode + resize still run, inference
    // is replaced by an immediate reply (HTTP-layer tests)
    svc.H = 36;
    svc.W = 64;
  } else {
    // ---- artifacts -------------------------------------------------------
    artifacts.resize(artifact_dirs.size());
    for (size_t i = 0; i < artifact_dirs.size(); ++i) {
      if (!LoadArtifactFiles(artifact_dirs[i], &artifacts[i])) return 1;
      if (i && !ArtifactsCompatible(artifacts[0], artifacts[i])) {
        fprintf(stderr,
                "pjrt_http_serve: %s is not the same program as %s at a "
                "different batch (H/W or output names/dtypes differ)\n",
                artifact_dirs[i].c_str(), artifact_dirs[0].c_str());
        return 1;
      }
    }
    std::sort(artifacts.begin(), artifacts.end(),
              [](const Artifact& a, const Artifact& b) { return a.B < b.B; });
    for (size_t i = 1; i < artifacts.size(); ++i)
      if (artifacts[i].B == artifacts[i - 1].B) {
        fprintf(stderr, "pjrt_http_serve: duplicate bucket batch %d\n",
                artifacts[i].B);
        return 1;
      }

    OutputIdx idx;
    for (size_t i = 0; i < artifacts[0].outputs.size(); ++i) {
      const std::string& n = artifacts[0].outputs[i].name;
      if (n == "theta") idx.theta = (int)i;
      else if (n == "consist_score") idx.score = (int)i;
      else if (n == "poi") idx.poi = (int)i;
      else if (n == "segm_mask") idx.segm = (int)i;
      else if (n == "warp_mask") idx.warp = (int)i;
    }
    if (idx.theta < 0 && idx.score < 0 && idx.poi < 0 && idx.segm < 0 &&
        idx.warp < 0) {
      fprintf(stderr,
              "pjrt_http_serve: artifact has none of theta/consist_score/poi/"
              "segm_mask/warp_mask outputs — nothing to serve\n");
      return 1;
    }
    for (int i : {idx.theta, idx.score, idx.poi})
      if (i >= 0 && artifacts[0].outputs[i].dtype != "float32") {
        fprintf(stderr, "pjrt_http_serve: output %s must be float32, got %s\n",
                artifacts[0].outputs[i].name.c_str(),
                artifacts[0].outputs[i].dtype.c_str());
        return 1;
      }
    for (int i : {idx.segm, idx.warp})
      if (i >= 0 && (artifacts[0].outputs[i].dtype != "uint8" ||
                     artifacts[0].outputs[i].dims.size() != 3)) {
        fprintf(stderr,
                "pjrt_http_serve: output %s must be uint8 [B,h,w], got %s "
                "rank %zu\n",
                artifacts[0].outputs[i].name.c_str(),
                artifacts[0].outputs[i].dtype.c_str(),
                artifacts[0].outputs[i].dims.size());
        return 1;
      }

    // ---- plugin / client / compile ---------------------------------------
    if (!sfh::LoadPlugin(plugin)) return 1;
    std::vector<std::string> opt_storage;
    client = sfh::CreateClient(raw_opts, &opt_storage);
    if (client == nullptr) return 1;
    PJRT_Device* device = sfh::FirstDevice(client);
    if (device == nullptr) return 1;
    for (auto& a : artifacts) {
      auto t0 = Clock::now();
      a.exec = sfh::Compile(client, a.module_bc, a.compile_options);
      if (a.exec == nullptr) return 1;
      size_t n = 0;
      if (!sfh::NumProgramOutputs(a.exec, &n)) return 1;
      if (n != a.outputs.size()) {
        fprintf(stderr,
                "pjrt_http_serve: %s: io_spec.txt lists %zu outputs but the "
                "program produces %zu — stale artifact?\n",
                a.dir.c_str(), a.outputs.size(), n);
        return 1;
      }
      auto t1 = Clock::now();
      fprintf(stderr, "pjrt_http_serve: bucket %d compiled in %.1f s\n", a.B,
              std::chrono::duration<double>(t1 - t0).count());
    }

    batcher = std::make_unique<Batcher>(client, device, &artifacts, idx,
                                      max_delay_ms);
    if (warmup && !batcher->Warmup()) return 1;
    batcher->Start();

    svc.batcher = batcher.get();
    svc.H = (int)artifacts[0].input.dims[1];
    svc.W = (int)artifacts[0].input.dims[2];
  }

  // ---- listen ----------------------------------------------------------
  int lfd = socket(AF_INET, SOCK_STREAM, 0);
  if (lfd < 0) {
    perror("pjrt_http_serve: socket");
    return 1;
  }
  int one = 1;
  setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  sockaddr_in addr;
  memset(&addr, 0, sizeof addr);
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1) {
    fprintf(stderr, "pjrt_http_serve: bad --host %s\n", host.c_str());
    return 1;
  }
  if (bind(lfd, (sockaddr*)&addr, sizeof addr) != 0 ||
      listen(lfd, 128) != 0) {
    perror("pjrt_http_serve: bind/listen");
    return 1;
  }
  socklen_t alen = sizeof addr;
  getsockname(lfd, (sockaddr*)&addr, &alen);
  g_listen_fd.store(lfd);
  signal(SIGINT, OnSignal);
  signal(SIGTERM, OnSignal);
  signal(SIGPIPE, SIG_IGN);
  // stdout so launchers/tests can parse the bound (possibly ephemeral) port
  printf("pjrt_http_serve: listening on port %d\n", ntohs(addr.sin_port));
  fflush(stdout);
  fprintf(stderr,
          "pjrt_http_serve: serving on http://%s:%d  (POST /predict, GET "
          "/healthz, GET /stats, GET /metrics); buckets:",
          host.c_str(), ntohs(addr.sin_port));
  if (batcher) {
    for (int b : batcher->buckets()) fprintf(stderr, " %d", b);
  } else {
    fprintf(stderr, " (echo mode)");
  }
  fprintf(stderr, "\n");

  timeval idle_tv;
  idle_tv.tv_sec = (time_t)idle_timeout_s;
  idle_tv.tv_usec = (suseconds_t)((idle_timeout_s - idle_tv.tv_sec) * 1e6);
  while (!g_stop.load()) {
    int cfd = accept(lfd, nullptr, nullptr);
    if (cfd < 0) {
      if (g_stop.load()) break;
      continue;
    }
    setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
    // slowloris / stalled-client guard: recv and send on the connection
    // block at most idle_timeout_s before the handler gives up and closes
    setsockopt(cfd, SOL_SOCKET, SO_RCVTIMEO, &idle_tv, sizeof idle_tv);
    setsockopt(cfd, SOL_SOCKET, SO_SNDTIMEO, &idle_tv, sizeof idle_tv);
    if (g_active_conns.load() >= max_connections) {
      // connection flood: shed load instead of growing threads unbounded.
      // Half-close + bounded drain before close: close() with unread
      // request bytes in the receive buffer emits RST, which can discard
      // the in-flight 503 — draining lets the client actually read it.
      SendResponse(cfd, 503, "application/json",
                   "{\"error\": \"connection limit reached\"}", false);
      shutdown(cfd, SHUT_WR);
      timeval drain_tv{0, 200000};  // 200 ms cap on the courtesy drain
      setsockopt(cfd, SOL_SOCKET, SO_RCVTIMEO, &drain_tv, sizeof drain_tv);
      char sink[4096];
      for (int i = 0; i < 16 && recv(cfd, sink, sizeof sink, 0) > 0; ++i) {
      }
      close(cfd);
      continue;
    }
    g_active_conns.fetch_add(1);
    std::thread(HandleConnection, cfd, &svc).detach();
  }

  fprintf(stderr, "pjrt_http_serve: draining...\n");
  if (batcher) batcher->Shutdown();
  // grace for detached handler threads to flush their final responses
  // before the client/executables go away under them
  std::this_thread::sleep_for(std::chrono::milliseconds(300));
  for (auto& a : artifacts) {
    PJRT_LoadedExecutable_Destroy_Args ed;
    memset(&ed, 0, sizeof ed);
    ed.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    ed.executable = a.exec;
    CheckError(Api()->PJRT_LoadedExecutable_Destroy(&ed),
               "Executable_Destroy");
  }
  if (client != nullptr) {
    PJRT_Client_Destroy_Args cd;
    memset(&cd, 0, sizeof cd);
    cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    cd.client = client;
    CheckError(Api()->PJRT_Client_Destroy(&cd), "Client_Destroy");
  }
  return 0;
}
