/* Training dashboard client: plain-WebSocket JSON protocol carrying the
   reference's event vocabulary (message / info / progress_tracker). */
(function () {
  var ws = new WebSocket('ws://' + location.host + '/train-ws');
  var log = document.getElementById('log');
  var layerInfo = {};

  function setBar(prefix, data) {
    var pct = data.total ? (100 * data.current / data.total) : 0;
    document.getElementById(prefix + '-bar').style.width = pct + '%';
    document.getElementById(prefix + '-label').textContent =
      data.current + ' / ' + data.total;
  }

  function appendLog(text) {
    log.value += text;
    log.scrollTop = log.scrollHeight;
  }

  function rebuildTable() {
    var table = document.getElementById('layer-table');
    while (table.rows.length > 1) table.deleteRow(1);
    Object.keys(layerInfo).forEach(function (name) {
      var info = layerInfo[name];
      var row = table.insertRow(-1);
      row.insertCell(-1).textContent = name;
      row.insertCell(-1).textContent = (info.shapes || []).join(' ');
      row.insertCell(-1).textContent = info.rf || '';
      var fwd = row.insertCell(-1);
      var bwd = row.insertCell(-1);
      if (info.forward) {
        fwd.textContent = info.forward.time + ' x' + info.forward.counter;
        if (info.forward.done) fwd.className = 'done';
      }
      if (info.backward) {
        bwd.textContent = info.backward.time + ' x' + info.backward.counter;
        if (info.backward.done) bwd.className = 'done';
      }
    });
  }

  ws.onmessage = function (e) {
    var msg = JSON.parse(e.data);
    var data = msg.data;
    if (msg.event === 'message') {
      appendLog(typeof data === 'string' ? data : JSON.stringify(data));
    } else if (msg.event === 'info') {
      (data.layer_names || []).forEach(function (name) {
        layerInfo[name] = layerInfo[name] || {};
      });
      Object.keys(data.output_shapes || {}).forEach(function (name) {
        layerInfo[name] = layerInfo[name] || {};
        layerInfo[name].shapes = data.output_shapes[name];
      });
      Object.keys(data.receptive_fields || {}).forEach(function (name) {
        layerInfo[name] = layerInfo[name] || {};
        layerInfo[name].rf = data.receptive_fields[name];
      });
      rebuildTable();
    } else if (msg.event === 'progress_tracker') {
      if (data.type === 'epoch') setBar('epoch', data.data || data);
      else if (data.type === 'train_iteration') setBar('train', data.data || data);
      else if (data.type === 'val_iteration') setBar('val', data.data || data);
      else if (data.type === 'forward_backward') {
        Object.keys(data.data || {}).forEach(function (name) {
          layerInfo[name] = layerInfo[name] || {};
          var events = data.data[name];
          if (events.forward) layerInfo[name].forward = events.forward;
          if (events.backward) layerInfo[name].backward = events.backward;
        });
        rebuildTable();
      }
    } else if (msg.event === 'stopped') {
      document.getElementById('status').textContent = 'stopped';
    }
  };

  document.getElementById('start').onclick = function () {
    ws.send(JSON.stringify({event: 'start', data: {
      use_gpu: document.getElementById('use_gpu').checked}}));
    document.getElementById('status').textContent = 'running...';
  };
  document.getElementById('stop').onclick = function () {
    ws.send(JSON.stringify({event: 'stop'}));
  };
})();
