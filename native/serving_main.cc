// lpm_serve: fully native serving binary — no Python anywhere.
//
//   lpm_serve --export_dir=/path/to/export --port=8500 [--check]
//
// Loads an artifact exported with with_stablehlo (export_model.py writes
// stablehlo.mlir + native_manifest.txt + weights.bin), compiles the module
// through the XLA PJRT CPU client (stablehlo_runner.cc), preloads the
// weights once as device buffers, and serves the same HTTP contract as
// serving.py: POST /predict with uint32-LE length-framed serialized
// records → {"predictions": [{"video_index", "classes", "scores"}]},
// GET /healthz → ok.  Records are parsed by the same wire-format proto
// parser the data pipeline uses (tfrecord_reader.cc).
//
// This is the C++ counterpart of the reference's TF-Serving deployment of
// its SavedModel exports (ref: export_model.py#ModelExporter
// serving_default) — the whole request path is native: socket → proto
// parse → PJRT execute → JSON.
//
// Threading (the C++ twin of serving.py#BatchingQueue): one detached
// handler thread per connection does the socket I/O and record unframing
// and never touches the model; a single executor thread owns the compiled
// module, coalesces concurrent requests up to the compiled batch size
// (lingering 2 ms for stragglers, like the Python queue's max_delay_ms),
// executes ONE padded device batch, and sends each request its slice.
// GET /statz reports {"requests", "executes", "rows", "coalesced"} so
// coalescing is observable.  --check loads everything, runs one zero
// batch, prints the first scores and exits — the smoke gate tests use.

#include <arpa/inet.h>
#include <csignal>
#include <poll.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <utility>
#include <vector>

// --- extern C APIs from the sibling translation units ----------------------

extern "C" {
// stablehlo_runner.cc
void* shr_compile(const char* mlir_data, int64_t mlir_len, char* err,
                  int64_t err_cap);
int32_t shr_preload(void* handle, int32_t nargs, const void** arg_data,
                    const int32_t* arg_dtypes, const int64_t* arg_dims,
                    const int32_t* arg_ndims, char* err, int64_t err_cap);
int32_t shr_execute(void* handle, int32_t nargs, const void** arg_data,
                    const int32_t* arg_dtypes, const int64_t* arg_dims,
                    const int32_t* arg_ndims, int32_t nouts, void** out_data,
                    const int64_t* out_bytes, char* err, int64_t err_cap);
void shr_destroy(void* handle);
// tfrecord_reader.cc
int32_t lpm_parse_frame_record(const uint8_t* data, int64_t len,
                               int32_t max_frames,
                               const int32_t* feature_sizes,
                               int32_t n_features, const char* feature_names,
                               uint8_t* out_frames, int32_t* out_num_frames);
int32_t lpm_parse_video_record(const uint8_t* data, int64_t len,
                               const int32_t* feature_sizes,
                               int32_t n_features, const char* feature_names,
                               float* out_features);
}

namespace {

// dtype tags (native_manifest.txt) → runner codes (stablehlo_runner.cc)
int32_t DtypeCode(const std::string& tag) {
  if (tag == "f32") return 0;
  if (tag == "s32") return 1;
  if (tag == "u8") return 2;
  if (tag == "bf16") return 3;
  if (tag == "s8") return 4;
  if (tag == "s64") return 5;
  if (tag == "pred") return 6;
  if (tag == "f64") return 7;
  return -1;
}

int64_t DtypeBytes(int32_t code) {
  switch (code) {
    case 0: case 1: return 4;
    case 2: case 4: case 6: return 1;
    case 3: return 2;
    case 5: case 7: return 8;
    default: return 0;
  }
}

struct ArraySpec {
  int32_t dtype = -1;
  std::vector<int64_t> dims;
  int64_t elems() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n;
  }
  int64_t bytes() const { return elems() * DtypeBytes(dtype); }
};

struct Manifest {
  std::string model;
  int32_t batch_size = 0, top_k = 0, frame_features = 0, max_frames = 0;
  std::vector<std::string> feature_names;
  std::vector<int32_t> feature_sizes;
  std::vector<ArraySpec> call_inputs, outputs, weights;
};

bool ReadFileBytes(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  bool ok = fread(out->data(), 1, n, f) == static_cast<size_t>(n);
  fclose(f);
  return ok;
}

bool ParseSpecRow(FILE* f, const char* kind, ArraySpec* spec) {
  char seen[32], tag[16];
  int32_t ndim;
  if (fscanf(f, "%31s %15s %d", seen, tag, &ndim) != 3) return false;
  if (strcmp(seen, kind) != 0) return false;
  spec->dtype = DtypeCode(tag);
  if (spec->dtype < 0 || ndim < 0 || ndim > 8) return false;
  spec->dims.resize(ndim);
  for (int i = 0; i < ndim; i++) {
    long long d;
    if (fscanf(f, "%lld", &d) != 1) return false;
    spec->dims[i] = d;
  }
  return true;
}

bool LoadManifest(const std::string& path, Manifest* m) {
  FILE* f = fopen(path.c_str(), "r");
  if (!f) return false;
  char word[64];
  int version, n;
  bool ok = fscanf(f, "%63s %d", word, &version) == 2 &&
            strcmp(word, "lpm_native_manifest") == 0 && version == 1;
  char name[128];
  ok = ok && fscanf(f, "%63s %127s", word, name) == 2 &&
       strcmp(word, "model") == 0;
  if (ok) m->model = name;
  auto scalar = [&](const char* key, int32_t* out) {
    return fscanf(f, "%63s %d", word, out) == 2 && strcmp(word, key) == 0;
  };
  ok = ok && scalar("batch_size", &m->batch_size);
  ok = ok && scalar("top_k", &m->top_k);
  ok = ok && scalar("frame_features", &m->frame_features);
  ok = ok && scalar("max_frames", &m->max_frames);
  ok = ok && scalar("n_features", &n);
  for (int i = 0; ok && i < n; i++) {
    int32_t size;
    ok = fscanf(f, "%63s %127s %d", word, name, &size) == 3 &&
         strcmp(word, "feature") == 0;
    if (ok) {
      m->feature_names.push_back(name);
      m->feature_sizes.push_back(size);
    }
  }
  ok = ok && scalar("n_call_inputs", &n);
  m->call_inputs.resize(ok ? n : 0);
  for (auto& s : m->call_inputs) ok = ok && ParseSpecRow(f, "call_input", &s);
  ok = ok && scalar("n_outputs", &n);
  m->outputs.resize(ok ? n : 0);
  for (auto& s : m->outputs) ok = ok && ParseSpecRow(f, "output", &s);
  ok = ok && scalar("n_weights", &n);
  m->weights.resize(ok ? n : 0);
  for (auto& s : m->weights) ok = ok && ParseSpecRow(f, "weight", &s);
  fclose(f);
  return ok;
}

std::string PackNames(const std::vector<std::string>& names) {
  std::string out;
  for (const auto& n : names) {
    out += n;
    out += '\0';
  }
  return out;
}

// --- the loaded model ------------------------------------------------------

struct Server {
  Manifest m;
  void* handle = nullptr;
  std::vector<uint8_t> weights_blob;  // backs the preloaded buffers
  std::string names_packed;
  int32_t total_size = 0;

  // request-scratch buffers, sized once (requests are serialized)
  std::vector<std::vector<uint8_t>> in_bufs, out_bufs;

  bool Load(const std::string& export_dir, std::string* err) {
    char errbuf[4096] = {0};
    if (!LoadManifest(export_dir + "/native_manifest.txt", &m)) {
      *err = "cannot parse native_manifest.txt (re-export with "
             "with_stablehlo)";
      return false;
    }
    names_packed = PackNames(m.feature_names);
    for (int32_t s : m.feature_sizes) total_size += s;

    std::vector<uint8_t> mlir;
    if (!ReadFileBytes(export_dir + "/stablehlo.mlir", &mlir)) {
      *err = "cannot read stablehlo.mlir";
      return false;
    }
    if (!ReadFileBytes(export_dir + "/weights.bin", &weights_blob)) {
      *err = "cannot read weights.bin";
      return false;
    }
    int64_t want = 0;
    for (const auto& w : m.weights) want += w.bytes();
    if (want != static_cast<int64_t>(weights_blob.size())) {
      *err = "weights.bin size mismatch vs manifest";
      return false;
    }

    handle = shr_compile(reinterpret_cast<const char*>(mlir.data()),
                         mlir.size(), errbuf, sizeof(errbuf));
    if (!handle) {
      *err = errbuf;
      return false;
    }

    std::vector<const void*> data(m.weights.size());
    std::vector<int32_t> dtypes(m.weights.size()), ndims(m.weights.size());
    std::vector<int64_t> dims;
    int64_t off = 0;
    for (size_t i = 0; i < m.weights.size(); i++) {
      data[i] = weights_blob.data() + off;
      dtypes[i] = m.weights[i].dtype;
      ndims[i] = m.weights[i].dims.size();
      dims.insert(dims.end(), m.weights[i].dims.begin(),
                  m.weights[i].dims.end());
      off += m.weights[i].bytes();
    }
    if (shr_preload(handle, m.weights.size(), data.data(), dtypes.data(),
                    dims.empty() ? nullptr : dims.data(), ndims.data(),
                    errbuf, sizeof(errbuf)) != 0) {
      *err = errbuf;
      return false;
    }
    // Predict() reinterprets out[0] as f32 values [B, k], out[1] as s32
    // indices [B, k] — pin that layout here rather than crashing later
    if (m.outputs.size() != 2 || m.outputs[0].dtype != 0 ||
        m.outputs[1].dtype != 1 || m.outputs[0].dims.size() != 2 ||
        m.outputs[0].dims[1] != m.top_k || m.outputs[1].dims != m.outputs[0].dims) {
      *err = "manifest outputs are not (f32 [B,k] values, s32 [B,k] indices)";
      return false;
    }
    if (m.call_inputs.empty() || m.batch_size <= 0 ||
        m.call_inputs[0].dims.empty() ||
        m.call_inputs[0].dims[0] != m.batch_size) {
      *err = "manifest call inputs inconsistent with batch_size";
      return false;
    }
    for (const auto& s : m.call_inputs) in_bufs.emplace_back(s.bytes(), 0);
    for (const auto& s : m.outputs) out_bufs.emplace_back(s.bytes(), 0);
    return true;
  }

  size_t RowBytes() const {
    return m.frame_features
               ? static_cast<size_t>(m.max_frames) * total_size
               : sizeof(float) * total_size;
  }

  // parse one serialized record into batch row `i` of the input scratch
  bool ParseOne(const uint8_t* rec, int64_t len, int32_t i,
                std::string* err) {
    uint8_t* row = in_bufs[0].data() + i * RowBytes();
    if (m.frame_features) {
      int32_t nf = 0;
      if (lpm_parse_frame_record(rec, len, m.max_frames,
                                 m.feature_sizes.data(),
                                 m.feature_sizes.size(),
                                 names_packed.c_str(), row, &nf) != 0) {
        *err = "malformed record";
        return false;
      }
      if (in_bufs.size() > 1)
        reinterpret_cast<int32_t*>(in_bufs[1].data())[i] = nf;
    } else {
      if (lpm_parse_video_record(rec, len, m.feature_sizes.data(),
                                 m.feature_sizes.size(),
                                 names_packed.c_str(),
                                 reinterpret_cast<float*>(row)) != 0) {
        *err = "malformed record";
        return false;
      }
    }
    return true;
  }

  // pad rows [n_used, B) by duplicating row src (the compiled batch is
  // fixed-size; extra rows are discarded after execution)
  void PadRows(int32_t n_used, int32_t src) {
    const size_t rb = RowBytes();
    for (int32_t i = n_used; i < m.batch_size; i++) {
      memcpy(in_bufs[0].data() + i * rb, in_bufs[0].data() + src * rb, rb);
      if (m.frame_features && in_bufs.size() > 1) {
        reinterpret_cast<int32_t*>(in_bufs[1].data())[i] =
            reinterpret_cast<int32_t*>(in_bufs[1].data())[src];
      }
    }
  }

  // one PJRT execution over the packed input scratch → output scratch
  bool ExecuteOnce(std::string* err) {
    char errbuf[4096] = {0};
    std::vector<const void*> data(in_bufs.size());
    std::vector<int32_t> dtypes(in_bufs.size()), ndims(in_bufs.size());
    std::vector<int64_t> dims;
    for (size_t i = 0; i < in_bufs.size(); i++) {
      data[i] = in_bufs[i].data();
      dtypes[i] = m.call_inputs[i].dtype;
      ndims[i] = m.call_inputs[i].dims.size();
      dims.insert(dims.end(), m.call_inputs[i].dims.begin(),
                  m.call_inputs[i].dims.end());
    }
    std::vector<void*> outs(out_bufs.size());
    std::vector<int64_t> out_bytes(out_bufs.size());
    for (size_t i = 0; i < out_bufs.size(); i++) {
      outs[i] = out_bufs[i].data();
      out_bytes[i] = out_bufs[i].size();
    }
    if (shr_execute(handle, data.size(), data.data(), dtypes.data(),
                    dims.data(), ndims.data(), outs.size(), outs.data(),
                    out_bytes.data(), errbuf, sizeof(errbuf)) != 0) {
      *err = errbuf;
      return false;
    }
    return true;
  }

  // JSON entries for batch rows [row_start, row_start+n) with request-local
  // video_index values [idx_base, idx_base+n); appends to *json
  void FormatRows(std::string* json, int32_t row_start, size_t n,
                  size_t idx_base, bool* first) const {
    const int32_t k = m.top_k;
    const float* values = reinterpret_cast<const float*>(out_bufs[0].data());
    const int32_t* indices =
        reinterpret_cast<const int32_t*>(out_bufs[1].data());
    char num[64];
    for (size_t i = 0; i < n; i++) {
      if (!*first) *json += ", ";
      *first = false;
      snprintf(num, sizeof(num), "{\"video_index\": %zu, \"classes\": [",
               idx_base + i);
      *json += num;
      const size_t r = row_start + i;
      for (int32_t j = 0; j < k; j++) {
        snprintf(num, sizeof(num), "%s%d", j ? ", " : "",
                 indices[r * k + j]);
        *json += num;
      }
      *json += "], \"scores\": [";
      for (int32_t j = 0; j < k; j++) {
        float v = values[r * k + j];
        // JSON has no NaN/Inf; a diverged checkpoint must not emit an
        // unparseable 200 body — null marks the broken score honestly
        if (std::isfinite(v)) {
          snprintf(num, sizeof(num), "%s%.6f", j ? ", " : "", v);
        } else {
          snprintf(num, sizeof(num), "%snull", j ? ", " : "");
        }
        *json += num;
      }
      *json += "]}";
    }
  }

  // records (spans into the request body) → JSON predictions, or "" + err.
  // Handles any record count by chunking into batch-size executions (the
  // solo path; concurrent sub-batch requests go through BatchHub instead).
  std::string Predict(const std::vector<std::pair<const uint8_t*, int64_t>>&
                          records,
                      std::string* err) {
    const int32_t B = m.batch_size;
    std::string json = "{\"predictions\": [";
    bool first = true;
    for (size_t start = 0; start < records.size();
         start += static_cast<size_t>(B)) {
      size_t n_real = records.size() - start;
      if (n_real > static_cast<size_t>(B)) n_real = B;
      for (size_t i = 0; i < n_real; i++) {
        if (!ParseOne(records[start + i].first, records[start + i].second,
                      i, err))
          return "";
      }
      PadRows(n_real, n_real - 1);
      if (!ExecuteOnce(err)) return "";
      FormatRows(&json, 0, n_real, start, &first);
    }
    json += "]}";
    return json;
  }
};

// --- minimal HTTP/1.1 ------------------------------------------------------

constexpr size_t kMaxBody = 64u << 20;

bool RecvRequest(int fd, std::string* head, std::vector<uint8_t>* body) {
  head->clear();
  body->clear();
  char buf[8192];
  size_t header_end = std::string::npos;
  std::string data;
  while (header_end == std::string::npos) {
    ssize_t n = recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) return false;
    data.append(buf, n);
    header_end = data.find("\r\n\r\n");
    if (data.size() > kMaxBody) return false;
  }
  *head = data.substr(0, header_end);
  size_t content_len = 0;
  // case-insensitive Content-Length scan
  for (size_t pos = 0; (pos = data.find(':', pos)) != std::string::npos &&
                       pos < header_end;
       pos++) {
    size_t ls = data.rfind('\n', pos);
    ls = (ls == std::string::npos) ? 0 : ls + 1;
    std::string key = data.substr(ls, pos - ls);
    for (auto& c : key) c = tolower(c);
    if (key == "content-length") {
      content_len = strtoull(data.c_str() + pos + 1, nullptr, 10);
      break;
    }
  }
  if (content_len > kMaxBody) return false;
  std::string rest = data.substr(header_end + 4);
  body->assign(rest.begin(), rest.end());
  while (body->size() < content_len) {
    ssize_t n = recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) return false;
    body->insert(body->end(), buf, buf + n);
  }
  body->resize(content_len);
  return true;
}

void SendResponse(int fd, int status, const char* status_text,
                  const std::string& content_type, const std::string& body) {
  char head[256];
  snprintf(head, sizeof(head),
           "HTTP/1.1 %d %s\r\nContent-Type: %s\r\nContent-Length: %zu\r\n"
           "Connection: close\r\n\r\n",
           status, status_text, content_type.c_str(), body.size());
  std::string out = head + body;
  size_t sent = 0;
  while (sent < out.size()) {
    ssize_t n = send(fd, out.data() + sent, out.size() - sent, 0);
    if (n <= 0) return;
    sent += n;
  }
}

// --- cross-request batching (the C++ twin of serving.py#BatchingQueue) -----
// (record unframing lives in BatchHub::HandleConn, offset-based; the
// serving.py#unframe_records convention applies: <4 trailing bytes are
// ignored, a record overrunning the body is a framing error)

struct PredictItem {
  int fd = -1;
  std::vector<uint8_t> body;  // owns the record bytes
  std::vector<std::pair<int64_t, int64_t>> recs;  // (offset, len) into body
};

struct BatchHub {
  Server* server = nullptr;
  int linger_ms = 2;  // how long to wait for stragglers (--linger_ms)
  std::mutex mu;
  std::condition_variable cv;
  std::deque<PredictItem> queue;
  std::atomic<uint64_t> stat_requests{0}, stat_executes{0}, stat_rows{0},
      stat_coalesced{0};
  std::atomic<int32_t> active_conns{0};
  // set UNDER mu before the batch leaves the queue: the graceful-shutdown
  // drain must see in-flight work, or main could destroy the stack-local
  // Server while the executor still dereferences it
  std::atomic<int32_t> busy{0};

  // bounded: the old one-request-at-a-time loop had implicit
  // backpressure; the queue must not grow without limit when clients
  // post faster than the executor drains (each item owns its body)
  static constexpr size_t kMaxQueued = 64;

  bool TrySubmit(PredictItem&& item) {
    {
      std::lock_guard<std::mutex> lk(mu);
      if (queue.size() >= kMaxQueued) return false;
      queue.push_back(std::move(item));
    }
    cv.notify_one();
    return true;
  }

  std::string Statz() {
    char buf[256];
    snprintf(buf, sizeof(buf),
             "{\"requests\": %llu, \"executes\": %llu, \"rows\": %llu, "
             "\"coalesced\": %llu}",
             (unsigned long long)stat_requests.load(),
             (unsigned long long)stat_executes.load(),
             (unsigned long long)stat_rows.load(),
             (unsigned long long)stat_coalesced.load());
    return buf;
  }

  static void Reply(int fd, int status, const char* text,
                    const std::string& body) {
    SendResponse(fd, status, text, "application/json", body);
    close(fd);
  }

  // The executor thread: owns the model scratch.  Takes one queued
  // request; if it fits in a sub-batch, lingers up to 2 ms (the Python
  // queue's max_delay_ms default) for more concurrent requests, packs
  // them into ONE fixed-batch execution, and sends every request its
  // slice.  Oversized requests run the chunked solo path.
  void Run() {
    const int32_t B = server->m.batch_size;
    while (true) {
      std::vector<PredictItem> batch;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return !queue.empty(); });
        busy.store(1);
        batch.push_back(std::move(queue.front()));
        queue.pop_front();
        if (static_cast<int64_t>(batch[0].recs.size()) < B) {
          auto deadline = std::chrono::steady_clock::now() +
                          std::chrono::milliseconds(linger_ms);
          size_t total = batch[0].recs.size();
          while (static_cast<int64_t>(total) < B) {
            if (queue.empty()) {
              if (cv.wait_until(lk, deadline) == std::cv_status::timeout)
                break;
              continue;
            }
            if (total + queue.front().recs.size() > static_cast<size_t>(B))
              break;
            total += queue.front().recs.size();
            batch.push_back(std::move(queue.front()));
            queue.pop_front();
          }
        }
      }
      Process(std::move(batch));
      busy.store(0);
    }
  }

  void Process(std::vector<PredictItem> batch) {
    const int32_t B = server->m.batch_size;
    std::string err;

    // oversized request → chunked solo path (never coalesced)
    if (batch.size() == 1 &&
        static_cast<int64_t>(batch[0].recs.size()) > B) {
      std::vector<std::pair<const uint8_t*, int64_t>> spans;
      spans.reserve(batch[0].recs.size());
      for (const auto& r : batch[0].recs)
        spans.emplace_back(batch[0].body.data() + r.first, r.second);
      std::string json = server->Predict(spans, &err);
      stat_executes += (batch[0].recs.size() + B - 1) / B;
      stat_rows += batch[0].recs.size();
      if (json.empty()) {
        Reply(batch[0].fd, 500, "Internal Server Error",
              std::string("{\"error\": \"") + err + "\"}");
      } else {
        Reply(batch[0].fd, 200, "OK", json);
      }
      return;
    }

    // pack all items' records into consecutive batch rows; a request
    // whose record fails to parse is answered 500 and excluded (its rows
    // are overwritten by the next item).  NOTE: the wire-format parser is
    // deliberately lenient (absent/garbled features parse as zero rows —
    // tfrecord_reader.cc), so via HTTP this branch is defensive depth,
    // reachable only through parser-contract violations
    struct Placed {
      size_t item;
      int32_t row_start;
      size_t n;
    };
    std::vector<Placed> placed;
    int32_t row = 0;
    for (size_t it = 0; it < batch.size(); it++) {
      const int32_t row0 = row;
      bool ok = true;
      for (const auto& r : batch[it].recs) {
        if (!server->ParseOne(batch[it].body.data() + r.first, r.second, row,
                              &err)) {
          ok = false;
          break;
        }
        row++;
      }
      if (!ok) {
        row = row0;
        Reply(batch[it].fd, 500, "Internal Server Error",
              std::string("{\"error\": \"") + err + "\"}");
        batch[it].fd = -1;
        continue;
      }
      placed.push_back({it, row0, batch[it].recs.size()});
    }
    if (placed.empty()) return;

    server->PadRows(row, row - 1);
    stat_executes += 1;
    stat_rows += row;
    if (batch.size() > 1) stat_coalesced += batch.size();

    if (!server->ExecuteOnce(&err)) {
      for (const auto& p : placed)
        Reply(batch[p.item].fd, 500, "Internal Server Error",
              std::string("{\"error\": \"") + err + "\"}");
      return;
    }
    for (const auto& p : placed) {
      std::string json = "{\"predictions\": [";
      bool first = true;
      server->FormatRows(&json, p.row_start, p.n, 0, &first);
      json += "]}";
      Reply(batch[p.item].fd, 200, "OK", json);
    }
  }

  // one detached thread per connection: socket I/O + unframing only —
  // the model is executor-owned
  void HandleConn(int fd) {
    std::string head;
    std::vector<uint8_t> body;
    if (!RecvRequest(fd, &head, &body)) {
      close(fd);
      active_conns--;
      return;
    }
    if (head.rfind("GET /healthz", 0) == 0) {
      SendResponse(fd, 200, "OK", "text/plain", "ok");
      close(fd);
    } else if (head.rfind("GET /statz", 0) == 0) {
      SendResponse(fd, 200, "OK", "application/json", Statz());
      close(fd);
    } else if (head.rfind("POST /predict", 0) == 0) {
      PredictItem item;
      item.fd = fd;
      item.body = std::move(body);
      size_t pos = 0;
      bool ok = true;
      while (pos + 4 <= item.body.size()) {
        uint32_t len;
        memcpy(&len, item.body.data() + pos, 4);
        pos += 4;
        if (pos + len > item.body.size()) {
          ok = false;
          break;
        }
        item.recs.emplace_back(pos, len);
        pos += len;
      }
      if (!ok || item.recs.empty()) {
        SendResponse(fd, 400, "Bad Request", "application/json",
                     "{\"error\": \"bad record framing\"}");
        close(fd);
      } else if (!TrySubmit(std::move(item))) {
        SendResponse(fd, 503, "Service Unavailable", "application/json",
                     "{\"error\": \"queue full\"}");
        close(fd);
      } else {
        stat_requests++;  // executor replies and closes
      }
    } else {
      SendResponse(fd, 404, "Not Found", "text/plain", "not found");
      close(fd);
    }
    active_conns--;
  }
};

}  // namespace

volatile sig_atomic_t g_stop = 0;

void HandleTerm(int) {
  // graceful stop: the accept loop polls with a 500 ms timeout and
  // re-checks this flag (close() does NOT wake a blocked accept() on
  // Linux); in-flight requests finish (executor drains its queue)
  g_stop = 1;
}

int main(int argc, char** argv) {
  // a client closing mid-response must EPIPE the send(), not kill the server
  signal(SIGPIPE, SIG_IGN);
  signal(SIGTERM, HandleTerm);
  signal(SIGINT, HandleTerm);
  std::string export_dir;
  int port = 8500;
  int linger_ms = 2;
  bool check_only = false;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a.rfind("--export_dir=", 0) == 0) export_dir = a.substr(13);
    else if (a.rfind("--port=", 0) == 0) port = atoi(a.c_str() + 7);
    else if (a.rfind("--linger_ms=", 0) == 0) linger_ms = atoi(a.c_str() + 12);
    else if (a == "--check") check_only = true;
    else {
      fprintf(stderr, "unknown arg: %s\n", a.c_str());
      return 2;
    }
  }
  if (export_dir.empty()) {
    fprintf(stderr,
            "usage: lpm_serve --export_dir=DIR [--port=8500] [--linger_ms=2] [--check]\n");
    return 2;
  }

  Server server;
  std::string err;
  if (!server.Load(export_dir, &err)) {
    fprintf(stderr, "load failed: %s\n", err.c_str());
    return 1;
  }
  fprintf(stderr, "loaded %s (model %s, batch %d, top_k %d)\n",
          export_dir.c_str(), server.m.model.c_str(), server.m.batch_size,
          server.m.top_k);

  if (check_only) {
    // one empty record exercises parse → execute → format
    static const uint8_t dummy = 0;
    std::vector<std::pair<const uint8_t*, int64_t>> records = {{&dummy, 0}};
    std::string json = server.Predict(records, &err);
    if (json.empty()) {
      fprintf(stderr, "check failed: %s\n", err.c_str());
      return 1;
    }
    printf("%s\n", json.c_str());
    return 0;
  }

  int sfd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(sfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr = {};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(port);
  if (bind(sfd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      listen(sfd, 16) != 0) {
    fprintf(stderr, "cannot bind :%d\n", port);
    return 1;
  }
  printf("lpm_serve: serving %s on :%d (batch %d)\n", export_dir.c_str(),
         port, server.m.batch_size);
  fflush(stdout);

  // intentionally leaked: destroying a condition_variable/mutex with the
  // detached executor thread blocked on it at exit() is UB (can hang the
  // graceful-shutdown path); the OS reclaims everything at process exit
  static BatchHub& hub = *new BatchHub();
  hub.server = &server;
  hub.linger_ms = linger_ms;
  std::thread([] { hub.Run(); }).detach();  // the model-owning executor

  struct pollfd pfd = {sfd, POLLIN, 0};
  while (!g_stop) {
    int pr = poll(&pfd, 1, 500);
    if (pr <= 0) continue;  // timeout or EINTR → re-check g_stop
    int fd = accept(sfd, nullptr, nullptr);
    if (fd < 0) continue;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    // an idle connection ties up only its own handler thread, but still
    // bound it; shed load instead of spawning unbounded threads
    struct timeval tmo = {30, 0};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tmo, sizeof(tmo));
    // and a SEND timeout: replies go out on the single model-owning
    // executor thread — a client that stops reading must cost at most
    // 30 s, not wedge every other request forever
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tmo, sizeof(tmo));
    if (hub.active_conns.load() >= 256) {
      SendResponse(fd, 503, "Service Unavailable", "application/json",
                   "{\"error\": \"too many connections\"}");
      close(fd);
      continue;
    }
    hub.active_conns++;
    std::thread([fd] { hub.HandleConn(fd); }).detach();
  }
  // drain: let queued AND in-flight requests get their replies before
  // exiting (busy covers the batch the executor already popped)
  for (int i = 0; i < 300; i++) {
    {
      std::lock_guard<std::mutex> lk(hub.mu);
      if (hub.queue.empty() && hub.active_conns.load() == 0 &&
          hub.busy.load() == 0)
        break;
    }
    usleep(100 * 1000);
  }
  fprintf(stderr, "lpm_serve: stopped\n");
  return 0;
}
